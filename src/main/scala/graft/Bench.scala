package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. A short untimed warmup first
  * — the first query otherwise pays JVM/codegen/parquet-reader init
  * (~8-10 s) and the numbers stop measuring the queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // local iteration only (driver never sets it): comma-separated name
    // prefixes to time just a subset, and an optional repeat count to
    // separate real cost from run-to-run variance
    val only: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    def selected(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one untimed pass first: JIT + whole-stage-codegen compilation +
    // parquet footer caches land here, so the timed pass measures
    // steady-state query cost (what a long-lived cluster actually pays)
    // instead of charging ~6-10 s of JVM warmup to whichever query runs
    // first.
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // noop write forces evaluation of EVERY output column — a bare
    // count() would let Catalyst skip projection work entirely and
    // under-time the scan-heavy queries.
    val results = (1 to reps).flatMap(r =>
      SparkEntry.queries.filter(kv => selected(kv._1)).map {
        case (name, fn) => (if (reps > 1) s"$name#$r" else name) -> fn
      }).map { case (name, fn) =>
      // GC fence (untimed): without it, a heavy predecessor's broadcast/
      // shuffle debris gets collected INSIDE the next query's timing —
      // observed inflating sub-second queries to 10+ s late in the run.
      // Also drop predecessors' localCheckpoint RDDs (partEdges, sketched,
      // q49's successor table): ContextCleaner reclaims them lazily, and
      // 141 queries' worth of pinned blocks squeeze storage memory enough
      // to triple late-run timings (g01 measured 5.3 s isolated vs 23.5 s
      // late in a full pass before this).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      // -1 marks a failed query — a swallow-and-time would make a crash
      // look like a fast run.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // The driver captures only the LAST ~2000 chars of the run log, so the
    // whole JSON line must fit in that window (minus sbt's ~90-char
    // [success] trailer). Full query names blew past it at 96 queries
    // (rounds 2-3 recorded parsed=null), so emit each query under its
    // unique family code — the prefix before the first '_' ("q01_agg_..."
    // -> "q01") — falling back to the full name if a collision ever
    // appears. 2-decimal timings for the same reason (at 136 queries the
    // line is ~1.8 kB; centisecond precision is far below this box's
    // run-to-run noise anyway).
    def fmt(v: Double): String = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    def code(name: String): String = name.takeWhile(_ != '_')
    val codesUnique = results.map(kv => code(kv._1)).toSet.size == results.size
    val qs = results.map { case (k, v) =>
      s"\"" + (if (codesUnique) code(k) else k) + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    Console.out.flush()
    spark.stop()
  }
}
