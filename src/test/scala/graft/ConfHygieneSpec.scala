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
