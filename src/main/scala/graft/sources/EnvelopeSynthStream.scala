package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.unsafe.types.UTF8String

/** Micro-batch streaming side of [[EnvelopeSynthSource]]: the offset IS a
  * global sequence-number high-water mark — exactly the reference's
  * checkpoint model (KCL sequence checkpoints, SURVEY §2.5 C1/C2), so
  * Spark's offset log plays the role of the DynamoDB lease table natively.
  *
  *  - admission control (`maxRecordsPerBatch`) bounds each micro-batch the
  *    way the reference's 500-record chunks do;
  *  - Trigger.AvailableNow drains the backlog and stops (the bounded-test
  *    shape of FlattenChunksTest);
  *  - restart resumes from the committed offset: no loss, no duplication.
  */
class SynthMicroBatchStream(records: Long, shards: Int, maxPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = SeqOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].seq
    SeqOffset(math.min(s + maxPerBatch, records))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerBatch)

  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = SeqOffset(records)

  override def deserializeOffset(json: String): Offset = SeqOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    Array.tabulate(shards)(sh => SynthShardRange(sh, shards, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = new SynthRangeReaderFactory
}

/** Offset = highest sequence number emitted so far (exclusive start). */
case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** Shard's slice of the (start, end] sequence range. */
case class SynthShardRange(shard: Int, shards: Int, startSeq: Long, endSeq: Long)
    extends InputPartition

private[sources] class SynthRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthShardRange]
    new PartitionReader[InternalRow] {
      private var i = p.startSeq
      private var current = 0L
      private val shardName = UTF8String.fromString(f"shardId-${p.shard}%012d")

      override def next(): Boolean = {
        i += 1
        while (i <= p.endSeq && EnvelopeSynthSource.shardOf(i, p.shards) != p.shard) i += 1
        current = i
        i <= p.endSeq
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
