package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec
import graft.streaming.Envelope

/** Contract test for the compile-only Kinesis surface: a MemoryStream in
  * the connector's wire shape drives the SAME downstream pipeline (envelope
  * mapping → JSON decode → per-shard fold) the synthetic sources run, so a
  * live `format("kinesis")` frame slots in with zero operator changes.
  */
class KinesisSurfaceSpec extends SparkSpec {

  private def wireRow(shard: String, seq: String, i: Int): KinesisWireRecord =
    KinesisWireRecord(
      data = s"""{ "id": $i }""".getBytes("UTF-8"),
      streamName = "graft-test-stream",
      partitionKey = s"key$i",
      sequenceNumber = seq,
      approximateArrivalTimestamp = new Timestamp(1767225600000L + i),
      shardId = shard)

  test("options map matches the reference's consumer constructor surface") {
    val cfg = KinesisSourceConfig("invoices", "us-east-1",
      startingPosition = "TRIM_HORIZON", consumerName = Some("graft-app"))
    assert(cfg.options === Map(
      "streamName" -> "invoices",
      "region" -> "us-east-1",
      "startingPosition" -> "TRIM_HORIZON",
      "consumerName" -> "graft-app"))
  }

  test("load() is gated off in this build with a clear message") {
    val e = intercept[IllegalArgumentException] {
      KinesisSourceConfig("invoices", "us-east-1").load(spark)
    }
    assert(e.getMessage.contains("compile-only"))
  }

  test("wire frame in the connector schema flows through envelope -> decode -> per-shard fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KinesisWireRecord]
    // two shards; seq numbers of DIFFERENT digit lengths so numeric vs
    // lexicographic ordering actually diverges (the seqOrderKey contract)
    mem.addData(
      wireRow("shardId-000000000000", "99", 1),
      wireRow("shardId-000000000000", "100", 2),
      wireRow("shardId-000000000001", "7", 3),
      wireRow("shardId-000000000001", "1005", 4))

    val raw = mem.toDF()
    assert(raw.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      KinesisEnvelopeSource.connectorWireSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      "MemoryStream wire shape = documented connector contract")

    val env = KinesisEnvelopeSource.envelope(raw)
    assert(env.schema.fieldNames.toSeq ===
      Envelope.schema.fieldNames.toSeq, "envelope column contract")

    val perShard = Envelope.decoded(env)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n"), sum("id").as("sum_id"),
        max_by(col("sequence_number"),
          KinesisEnvelopeSource.seqOrderKey(col("sequence_number"))).as("last_seq"))
    val q = perShard.writeStream
      .format("memory").queryName("kinesis_contract")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("kinesis_contract")
      .orderBy("shard_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("shardId-000000000000", 2L, 3L, "100"),   // numeric order: 100 > 99
      ("shardId-000000000001", 2L, 7L, "1005"))) // and 1005 > 7
  }

  test("seqOrderKey orders real-world 56-digit sequence numbers numerically through the fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The shape live Kinesis emits: ~56-digit decimal strings. Chosen so
    // plain STRING order disagrees with numeric order twice over — the
    // 55-digit value starting with '9' string-sorts above every 56-digit
    // value, and among equal lengths '1999…' vs '2000…' exercises the
    // digit comparison — so the (length, digits) key is what's proven,
    // not an accident of the data.
    val seqs = Seq(
      "9" + "8" * 54,                                  // 55 digits, string-max
      "1" + "9" * 55,                                  // 56 digits: 1999…9
      "2" + "0" * 55,                                  // 56 digits: 2000…0 = numeric max
      "49590338271490256608559692538361571095921575989136588898")
    assert(seqs.forall(s => s.length >= 55 || s == seqs(3)) && seqs(3).length == 56)
    val mem = MemoryStream[KinesisWireRecord]
    mem.addData(seqs.zipWithIndex.map { case (sq, i) => wireRow("shardId-000000000007", sq, i) }: _*)

    val last = KinesisEnvelopeSource.envelope(mem.toDF())
      .groupBy("shard_id")
      .agg(max_by(col("sequence_number"),
        KinesisEnvelopeSource.seqOrderKey(col("sequence_number"))).as("last_seq"),
        min_by(col("sequence_number"),
          KinesisEnvelopeSource.seqOrderKey(col("sequence_number"))).as("first_seq"))
    val q = last.writeStream
      .format("memory").queryName("kinesis_seq56")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val Array(row) = spark.table("kinesis_seq56").collect()
    val numericMax = seqs.maxBy(BigInt(_))
    val numericMin = seqs.minBy(BigInt(_))
    assert(row.getString(1) === numericMax, "high-water mark must be the numeric max")
    assert(row.getString(2) === numericMin, "low mark must be the numeric min")
    assert(seqs.max !== numericMax, "data must make string order disagree, or the test proves nothing")
  }
}

case class KinesisWireRecord(
    data: Array[Byte],
    streamName: String,
    partitionKey: String,
    sequenceNumber: String,
    approximateArrivalTimestamp: Timestamp,
    shardId: String)
