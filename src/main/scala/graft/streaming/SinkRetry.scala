package graft.streaming

import scala.concurrent.duration._
import org.apache.spark.sql.DataFrame

/** C4 (SURVEY.md §2.5): error-classified sink retry — the Spark spelling
  * of the reference's composed producer retry schedule
  * (`TestUtils.scala:45-50`):
  *
  *   Schedule.doWhile { case _: ResourceNotFoundException => true; ... }
  *     && Schedule.recurs(5) && Schedule.exponential(2.second)
  *
  * The ZIO `&&` intersects the three schedules: retry WHILE the error is
  * transient-classified AND at most `maxRetries` times, sleeping
  * exponentially from `baseDelay`. Reproduced exactly: a non-transient
  * error rethrows immediately (a schema mismatch must fail the query, not
  * burn five sleeps masking it), and a transient error that outlives the
  * budget rethrows too. Exactly-once stays with the CHECKPOINT — a
  * rethrown micro-batch replays on restart — this wrapper only rides out
  * transient sink outages without paying a full query restart.
  */
object SinkRetry {

  /** Transient-error allowlist. The Kinesis SDK isn't on the classpath, so
    * classification is by exception class NAME (the production wrapper
    * swaps in `case _: ResourceNotFoundException` directly); IO/timeout
    * are the generic transient families every remote sink shares.
    */
  def defaultTransient(t: Throwable): Boolean = {
    val n = t.getClass.getSimpleName
    t.isInstanceOf[java.io.IOException] ||
    t.isInstanceOf[java.util.concurrent.TimeoutException] ||
    n.contains("ResourceNotFound") || n.contains("Throttling") ||
    n.contains("ProvisionedThroughputExceeded") || n.contains("ServiceUnavailable")
  }

  /** Run `body`, retrying under the composed schedule. `sleep` is
    * injectable so specs assert the exponential delays without waiting
    * through them.
    */
  def retrying[A](maxRetries: Int = 5,
                  baseDelay: FiniteDuration = 2.seconds,
                  isTransient: Throwable => Boolean = defaultTransient,
                  sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))
                 (body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case t: Throwable if isTransient(t) && attempt < maxRetries =>
          sleep(baseDelay * (1L << attempt))
          attempt += 1
        // non-transient, or transient past the budget: propagate — the
        // streaming checkpoint owns recovery from here
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Wrap a foreachBatch body with the retry schedule. */
  def foreachBatchWithRetry(maxRetries: Int = 5,
                            baseDelay: FiniteDuration = 2.seconds,
                            isTransient: Throwable => Boolean = defaultTransient,
                            sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))
                           (write: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      retrying(maxRetries, baseDelay, isTransient, sleep)(write(batch, batchId))
}
