package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eagerly materialize a derived frame that several downstream consumers
  * re-read (an edge table, a sketch table, a recursion seed).
  *
  * persist(DISK_ONLY) + count, NOT `localCheckpoint(true)`: localCheckpoint
  * truncates the lineage into NON-REPLICATED executor-local storage, so on
  * a real cluster one lost executor makes every later read of the frame
  * fail unrecoverably — there is no lineage left to recompute from.
  * DISK_ONLY keeps the lineage: a lost block is recomputed from the
  * parquet source, which is the fault-tolerance contract a 1000-executor
  * job needs. The eager count forces all blocks up front so concurrent
  * consumers never race to compute the same partition.
  *
  * The frame stays persisted until the caller unpersists it (or the
  * session ends). Bench unpersists every cached RDD between queries; that
  * blanket sweep is SAFE against these frames precisely because the
  * lineage survives — a swept block is recomputed, never a job killer.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.DISK_ONLY)
    df.count()
    df
  }
}
