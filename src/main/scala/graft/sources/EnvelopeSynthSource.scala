package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's sharded source (SURVEY
  * §2.1 S1/S2): generates the `putRecordsEmitter` workload — envelope
  * records `{ "id": i }` with partition keys `key$i` hash-routed onto
  * shards — with ONE Spark input partition PER SHARD, making "shard ⇒
  * unit of source parallelism" literal in the connector API (what a real
  * Kinesis connector does with shard iterators).
  *
  * Each partition enumerates only its own shard's records (the shard
  * routing hash is evaluated inline — no scan-and-filter amplification,
  * no coordination). Deterministic: same options ⇒ same data on every
  * executor and every retry.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.EnvelopeSynthSource")
  *   .option("records", "100000").option("shards", "32").load()
  * }}}
  */
class EnvelopeSynthSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EnvelopeSynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // Spark hands getTable the ORIGINAL-case option map; re-wrap it so
    // `.option("maxRecordsPerBatch", ...)` and friends resolve.
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      records = Option(opts.get("records")).map(_.toLong).getOrElse(1000L),
      shards = Option(opts.get("shards")).map(_.toInt).getOrElse(32),
      maxPerBatch = Option(opts.get("maxrecordsperbatch")).map(_.toLong).getOrElse(500L))
  }
}

object EnvelopeSynthSource {
  val schema: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("arrival_ts", TimestampType, nullable = false),
    StructField("data", StringType, nullable = false)))

  /** Same routing as ShardedBatchProducer.shardOf (keep in sync). */
  def shardOf(i: Long, nrShards: Int): Int = {
    var h = i * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32)
    ((h % nrShards + nrShards) % nrShards).toInt
  }

  val BaseTsMicros: Long = 1767225600000L * 1000L // 2026-01-01 UTC, µs
}

private[sources] class SynthTable(records: Long, shards: Int, maxPerBatch: Long)
    extends Table with SupportsRead {

  override def name(): String = s"envelope_synth(records=$records, shards=$shards)"
  override def schema(): StructType = EnvelopeSynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(records, shards, maxPerBatch)
}

private[sources] class SynthScanBuilder(records: Long, shards: Int, maxPerBatch: Long)
    extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = EnvelopeSynthSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"EnvelopeSynth[$records records, $shards shards]"

  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(records, shards, maxPerBatch)

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(shards)(s => SynthShardPartition(s, shards, records))

  override def createReaderFactory(): PartitionReaderFactory = new SynthReaderFactory
}

/** One shard = one partition; fields are the full generation recipe, so
  * readers are stateless and retry-safe.
  */
case class SynthShardPartition(shard: Int, shards: Int, records: Long) extends InputPartition

private[sources] class SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthShardPartition]
    new PartitionReader[InternalRow] {
      private var i = 0L
      private var current = 0L
      private val shardName = UTF8String.fromString(f"shardId-${p.shard}%012d")

      override def next(): Boolean = {
        i += 1
        // enumerate this shard's subsequence inline — the hash is the
        // routing table, nothing is scanned or filtered
        while (i <= p.records && EnvelopeSynthSource.shardOf(i, p.shards) != p.shard) i += 1
        current = i
        i <= p.records
      }

      override def get(): InternalRow = InternalRow(
        shardName,
        UTF8String.fromString(s"key$current"),
        current,
        EnvelopeSynthSource.BaseTsMicros + current * 1000L,
        UTF8String.fromString(s"""{ "id": $current }"""))

      override def close(): Unit = ()
    }
  }
}
