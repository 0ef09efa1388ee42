package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.Envelope

/** The DSv2 sharded source: S1's "shard = unit of source parallelism"
  * expressed in the connector API itself.
  */
class EnvelopeSynthSourceSpec extends SparkSpec {

  private def load(records: Long, shards: Int) =
    spark.read.format("graft.sources.EnvelopeSynthSource")
      .option("records", records.toString)
      .option("shards", shards.toString)
      .load()

  test("one input partition per shard, all records exactly once") {
    val df = load(records = 20000, shards = 16)
    assert(df.rdd.getNumPartitions === 16, "shard ⇒ source partition")
    assert(df.count() === 20000L)
    assert(df.select("sequence_number").distinct().count() === 20000L)
    assert(df.select("shard_id").distinct().count() === 16L)
  }

  test("rows live in the partition their shard hash says (no cross-shard leakage)") {
    val df = load(records = 5000, shards = 8)
    val bad = df.select(col("shard_id"), col("sequence_number"))
      .mapPartitions { it =>
        val shardsSeen = it.map(_.getString(0)).toSet
        Iterator(shardsSeen.size)
      }(org.apache.spark.sql.Encoders.scalaInt)
      .collect()
    assert(bad.forall(_ <= 1), "each physical partition holds exactly one shard")
  }

  test("micro-batch stream: chunked batches, offsets are sequence checkpoints, restart resumes") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ckpt = java.nio.file.Files.createTempDirectory("synth-stream-ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("synth-stream-sink").toString

    def run(records: Long): Unit = {
      val q = spark.readStream.format("graft.sources.EnvelopeSynthSource")
        .option("records", records.toString)
        .option("shards", "8")
        .option("maxRecordsPerBatch", "400") // non-default: proves camelCase options resolve
        .load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    run(2000)  // 5 batches of 400 (chunk-sized admission control)
    run(5000)  // restart: offset log resumes at 2000, emits only 2001..5000
    val out = spark.read.parquet(sink)
    assert(out.count() === 5000L, "restart resumed from the committed offset")
    assert(out.select("sequence_number").distinct().count() === 5000L, "exactly once")
    // offsets in the checkpoint are human-readable sequence numbers
    val offsets = new java.io.File(ckpt, "offsets").listFiles().map(_.getName).sorted
    assert(offsets.length >= 5, s"chunked micro-batches expected, got ${offsets.length}")
  }

  test("the reference count-conservation pipeline runs unchanged on the DSv2 source") {
    // decode → count: same invariant as the file-stream path, same
    // producer parameters as the reference (100k / 32 shards)
    val decoded = Envelope.decoded(load(records = 100000, shards = 32))
    assert(decoded.agg(count(lit(1))).head().getLong(0) === 100000L)
    assert(decoded.agg(sum(col("id").cast("long"))).head().getLong(0) === 100000L * 100001L / 2)
    // matches the offline producer's routing exactly
    val producer = new graft.streaming.ShardedBatchProducer(
      java.nio.file.Files.createTempDirectory("synth-cmp").toString, 32, 500)
    val expected = (1L to 1000L).groupBy(producer.shardOf).map { case (s, ids) =>
      (f"shardId-$s%012d", ids.size.toLong)
    }
    val got = load(records = 1000, shards = 32).groupBy("shard_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    expected.foreach { case (shard, n) => assert(got(shard) === n) }
  }
}
