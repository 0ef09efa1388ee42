package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

/** E2E mirror of the reference's FlattenChunksTest: produce N records in
  * batches across 32 shards, consume as a stream, assert exact count
  * conservation (the reference's single invariant,
  * FlattenChunksTest.scala:59).
  */
class StreamingPipelineSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("count conservation: N produced == N counted across 32 shards") {
    val dir = tmp("graft-ingest")
    val ckpt = tmp("graft-ckpt")
    val n = 10000L
    val producer = new ShardedBatchProducer(dir, nrShards = 32, batchSize = 500)
    producer.emit(1, n + 1)

    val counts = Pipelines.runningCount(Pipelines.decoded(Pipelines.ingest(spark, dir)))
    val q = counts.writeStream
      .format("memory").queryName("conservation")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(spark.table("conservation").head().getLong(0) === n)
  }

  test("per-shard counts and last-seq match the producer's deterministic routing") {
    val dir = tmp("graft-shards")
    val n = 2000L
    val producer = new ShardedBatchProducer(dir, nrShards = 8, batchSize = 250)
    producer.emit(1, n + 1)

    val expected = (1L to n).groupBy(producer.shardOf)
      .map { case (s, ids) => (f"shardId-$s%012d", ids.size.toLong, ids.max) }

    val decoded = Pipelines.decoded(Pipelines.ingest(spark, dir))
    val q = Pipelines.shardProgress(decoded)
      .writeStream.format("memory").queryName("per_shard")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("per_shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected.toSet)
  }

  test("decode: malformed payloads null out in PERMISSIVE, survive the count in envelope form") {
    import spark.implicits._
    val env = Seq(
      ("s-0", "key1", 1L, "{ \"id\": 1 }"),
      ("s-0", "key2", 2L, "not json at all"))
      .toDF("shard_id", "partition_key", "sequence_number", "data")
    val out = Envelope.decoded(env).collect()
    assert(out.length === 2)
    assert(out.find(_.getLong(2) == 1L).get.getAs[Int]("id") === 1)
    assert(out.find(_.getLong(2) == 2L).get.isNullAt(out.head.fieldIndex("id")))
  }

  test("stream limit: listener stops the query once >= N records are ingested") {
    val dir = tmp("graft-limit")
    val n = 5000L
    val limit = 1200L
    val producer = new ShardedBatchProducer(dir, nrShards = 4, batchSize = 100)
    producer.emit(1, n + 1) // 50 files of 100

    val lim = new StreamLimit(spark, limit)
    lim.register()
    // 5 files (500 rows) per micro-batch; listener should stop after ~3 batches.
    val src = Pipelines.ingest(spark, dir, maxFilesPerTrigger = Some(5))
    val q = Pipelines.decoded(src).writeStream
      .format("noop")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    lim.attach(q)
    q.awaitTermination(120000L)
    assert(!q.isActive, "limit listener should have stopped the query")
    assert(lim.totalSeen >= limit && lim.totalSeen < n,
      s"stopped after ${lim.totalSeen} records (limit $limit, produced $n)")
  }
}
