package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q27's sketches are rows-only at the driver gate (HLL/KLL internals are
  * engine-specific, so no SQL oracle can hash-match) — this spec supplies
  * the real check: the approximations must land within their configured
  * error bounds of the exact answers.
  */
class SketchSpec extends SparkSpec {

  test("q27: approx_count_distinct within rsd bound; percentiles bracket the exact ranks") {
    val got = Relational.queries("q27_approx_distinct")(spark, sfDir).collect()
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
    val exactDistinct = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val flag = r.getString(0)
      val approx = r.getLong(1)
      val exact = exactDistinct(flag)
      // rsd 0.02 configured; allow 5 sigma
      assert(math.abs(approx - exact).toDouble / exact <= 0.10,
        s"$flag: approx_count_distinct $approx vs exact $exact")
    }
    // exact percentiles of the same column bracket the sketch answers:
    // approx_percentile guarantees rank error <= accuracy default (1e-4
    // relative rank) — generous value-space tolerance here
    val exactPct = li.groupBy("l_returnflag")
      .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.5, 0.95, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    got.foreach { r =>
      val flag = r.getString(0)
      val (p50, p95, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val ex = exactPct(flag)
      assert(math.abs(p50 - ex(0)) / ex(0) <= 0.01, s"$flag p50 $p50 vs ${ex(0)}")
      assert(math.abs(p95 - ex(1)) / ex(1) <= 0.01, s"$flag p95 $p95 vs ${ex(1)}")
      assert(math.abs(p99 - ex(2)) / ex(2) <= 0.01, s"$flag p99 $p99 vs ${ex(2)}")
    }
  }

  test("q52: HLL union is lossless (parts == whole) and estimates track exact counts") {
    val ev = Tables.events(spark, sfDir)
    val got = Relational.queries("q52_sketch_union")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("ALL") && got.size > 2)

    // Mergeability — the at-scale claim: the union of per-group sketches
    // must equal a single-pass sketch over the whole column. HLL merge is
    // a register-wise max, so this is exact equality, not a tolerance.
    val onePass = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head().getLong(0)
    assert(got("ALL") === onePass,
      s"union-of-parts ${got("ALL")} != one-pass sketch $onePass")

    // Accuracy: lgConfigK=12 → RSE ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5 sigma.
    val exactByType = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    (exactByType + ("ALL" -> exactAll)).foreach { case (k, exact) =>
      assert(math.abs(got(k) - exact).toDouble / exact <= 0.08,
        s"$k: hll estimate ${got(k)} vs exact $exact")
    }

    // The union must actually dedup: users appear under several event
    // types, so ALL is strictly below the sum of the per-type estimates.
    val sumParts = (got - "ALL").values.sum
    assert(got("ALL") < sumParts,
      s"union ${got("ALL")} should be < sum of per-type estimates $sumParts")

    // Storability — the half of the idiom the query can't show: sketches
    // written to parquet and unioned from the STORED table must answer
    // identically to the inline union (binary round-trip is lossless).
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    try {
      ev.groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
        .write.mode("overwrite").parquet(s"$dir/sketches.parquet")
      val fromStore = spark.read.parquet(s"$dir/sketches.parquet")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
        .head().getLong(0)
      assert(fromStore === got("ALL"),
        s"stored-sketch union $fromStore != inline union ${got("ALL")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
