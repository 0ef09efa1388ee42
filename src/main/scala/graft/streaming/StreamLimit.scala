package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** L1 (`take(nrRecords)`, `FlattenChunksTest.scala:42`): a global streaming
  * LIMIT. Micro-batch mode has no native one, so this is the documented
  * listener pattern: watch cumulative `numInputRows`, stop the query once
  * the total reaches N. Granularity is a micro-batch (the reference's own
  * `take` has an analogous coarseness across 32 concurrent shards — see the
  * flakiness comment at `FlattenChunksTest.scala:55-58`).
  */
class StreamLimit(spark: SparkSession, limit: Long) extends StreamingQueryListener {

  private val seen = new AtomicLong(0L)
  @volatile private var queryId: java.util.UUID = _

  /** Call AFTER attach(): progress events that arrive un-attached are
    * ignored (counting them would tally — and stop — unrelated queries).
    */
  def register(): Unit = spark.streams.addListener(this)

  def attach(q: StreamingQuery): Unit = { queryId = q.id }

  def totalSeen: Long = seen.get()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    spark.streams.removeListener(this)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    // Count only after attach(): with no queryId this would tally (and
    // potentially stop) ANY streaming query on the session.
    if (queryId != null && e.progress.id == queryId) {
      val total = seen.addAndGet(e.progress.numInputRows)
      if (total >= limit) {
        // stop asynchronously — stop() joins the stream thread, and this
        // callback runs on the listener bus, which that thread awaits.
        val q = spark.streams.get(e.progress.id)
        if (q != null) new Thread(() => q.stop()).start()
      }
    }
  }
}
