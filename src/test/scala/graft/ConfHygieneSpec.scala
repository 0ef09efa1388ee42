package graft

import org.apache.spark.sql.functions.col

/** Queries may scope a session conf to their own execution (q49 raises the
  * recursion row cap, connectedComponents and the streaming runner resize
  * shuffle partitions) but must restore it: an unreset conf leaks into
  * every later query in the session — q49's unreset recursion cap, for
  * example, would silently remove the runaway-recursion guard for the rest
  * of a 145-query run. This spec runs every conf-mutating query and
  * asserts the session conf map is bit-identical before and after.
  */
class ConfHygieneSpec extends SparkSpec {

  /** The confs the conf-scoping queries touch, plus the global defaults
    * that would catch an accidental new mutation nearby.
    */
  private val watched = Seq(
    "spark.sql.shuffle.partitions",
    "spark.sql.cteRecursionRowLimit",
    "spark.sql.adaptive.enabled",
    "spark.sql.ansi.enabled")

  private def snapshot(): Map[String, String] =
    watched.map(k => k -> spark.conf.getOption(k).getOrElse("<unset>")).toMap

  test("conf-mutating queries restore every session conf they touch") {
    val before = snapshot()
    // the three known conf-scoping paths: recursion cap (q49), shuffle
    // partitions in the CC loop (d07), shuffle partitions in the
    // streaming runner (s04 passes statePartitions)
    for (name <- Seq("q49_recursive_cte", "d07_dup_clusters", "s04_stream_user_state")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      assert(snapshot() === before, s"session conf drifted after $name")
    }
    assert(snapshot() === before)
  }

  test("d07's partition override is invisible to a query running CONCURRENTLY on the same context") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    // Round 7: the CC loop (d07) and the recursive walk (q49) run their
    // conf overrides on isolated child sessions. The old restore-in-
    // finally discipline kept the conf clean BETWEEN queries but mutated
    // it DURING — a concurrent runner could have its shuffle partitioning
    // (or recursion guard) swapped mid-plan. This drives both at once on
    // one SparkContext and asserts the foreground query's results and
    // session conf stay bit-identical at every probe while d07 is live.
    val expected = SparkEntry.queries("q04_join_sortmerge")(spark, sfDir).collect().toSeq
    val before = snapshot()
    val d07 = Future(SparkEntry.queries("d07_dup_clusters")(spark, sfDir).count())
    var probes = 0
    while (!d07.isCompleted && probes < 50) {
      assert(snapshot() === before, "session conf mutated mid-flight by concurrent d07")
      val got = SparkEntry.queries("q04_join_sortmerge")(spark, sfDir).collect().toSeq
      assert(got === expected, "q04 result drifted while d07 ran concurrently")
      probes += 1
    }
    assert(probes > 0, "d07 finished before any concurrent probe ran — rerun with a slower box or bigger sf")
    assert(Await.result(d07, 10.minutes) > 0)
    assert(snapshot() === before)
  }

  test("a full no-op pass over a query leaves no persisted-RDD leak beyond materializations") {
    // Materialize-d frames stay cached by design (Bench sweeps them
    // between queries); what must NOT grow is the count across REPEATED
    // invocations of the same query — that would be a per-invocation leak.
    SparkEntry.queries("d07_dup_clusters")(spark, sfDir).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    SparkEntry.queries("d07_dup_clusters")(spark, sfDir).count()
    val n1 = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("d07_dup_clusters")(spark, sfDir).count()
    val n2 = spark.sparkContext.getPersistentRDDs.size
    assert(n2 <= n1 + 1,
      s"repeated d07 invocations grew the persisted-RDD set: $n1 -> $n2")
  }
}
