package graft.operators

import graft.SparkSpec

/** Pins the Morton-key arithmetic against a bit-by-bit reference
  * implementation, and asserts the property the operator exists for:
  * z-order buckets are tight in BOTH dimensions, a linear sort in one.
  */
class LayoutSpec extends SparkSpec {

  /** Bit-by-bit reference interleave: x at odd positions, y at even. */
  private def refInterleave(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i + 1)
      z |= ((y >> i) & 1).toLong << (2 * i)
      i += 1
    }
    z
  }

  test("zExpr equals the bit-by-bit reference on edge and scattered values") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq(0, 1, 2, 255, 256, 4095, 12345, 32768, 65534, 65535)
    val pairs = for (x <- vals; y <- vals) yield (x.toLong, y.toLong)
    val got = pairs.toDF("x", "y")
      .withColumn("z", expr(Layout.zExpr("x", "y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === refInterleave(x.toInt, y.toInt),
        s"interleave mismatch at ($x, $y)")
    }
  }

  test("zExpr masks inputs to 16 bits (no bleed into neighbor positions)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq((65536L + 7L, 131072L + 9L)).toDF("x", "y")
      .withColumn("z", expr(Layout.zExpr("x", "y"))).collect()(0).getLong(2)
    assert(r === refInterleave(7, 9))
  }

  test("z buckets are tight in both dims; a linear sort is tight in only one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uniform deterministic grid over the full 16-bit domain
    val pts = (0 until 4096).map { i =>
      (((i * 40503) % 65536).toLong, ((i * 30223) % 65536).toLong)
    }.toDF("x", "y")

    val zRanges = pts
      .withColumn("bucket", expr(s"(${Layout.zExpr("x", "y")}) div ${Layout.ZBucketDiv}"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .agg(avg("rx").as("arx"), avg("ry").as("ary")).collect()(0)

    // same point set, 256 equal-width buckets on x alone
    val linRanges = pts
      .withColumn("bucket", expr("x div 256"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .agg(avg("rx").as("arx"), avg("ry").as("ary")).collect()(0)

    // a z bucket is a 4096×4096 tile: both dims bounded by the tile edge
    assert(zRanges.getDouble(0) <= 4096.0 && zRanges.getDouble(1) <= 4096.0,
      s"z buckets must be tile-bounded in BOTH dims, got $zRanges")
    // the linear layout keeps x tight but y spans ~the whole domain
    assert(linRanges.getDouble(0) <= 4096.0, "linear layout should be tight in x")
    assert(linRanges.getDouble(1) > 8 * zRanges.getDouble(1),
      s"linear layout's y range (${linRanges.getDouble(1)}) should dwarf the " +
        s"z layout's (${zRanges.getDouble(1)}) — that gap IS the data-skipping win")
  }

  test("z02 compaction plan: first-fit invariants hold on the fixture inventory") {
    val rows = Layout.queries("z02_compaction_plan")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val target = Layout.CompactTargetRows
    rows.groupBy(_._1).foreach { case (month, files) =>
      val bins = files.groupBy(_._4)
      val maxFile = files.map(_._3).max
      // bin ids are contiguous from 0 (a gap would mean a planned output
      // file nothing maps to) — guaranteed whenever no single file
      // overflows a whole bin by itself
      if (maxFile <= target) {
        val ids = bins.keySet
        assert(ids === (0L until ids.size).toSet, s"$month: non-contiguous bins $ids")
      }
      // first-fit bound: a bin only opens once the running sum crosses its
      // boundary, so no bin holds more than target + (largest single file)
      bins.foreach { case (bin, members) =>
        assert(members.map(_._3).sum <= target + maxFile,
          s"$month bin $bin overflows the first-fit bound")
      }
      // total mass is conserved across bins
      assert(bins.values.map(_.map(_._3).sum).sum === files.map(_._3).sum)
    }
  }

  test("z04 partition pruning: superset scan, edge cost real, pruning non-trivial") {
    val rows = Layout.queries("z04_partition_pruning")(spark, sfDir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (nPart, nRead) = (r.getLong(1), r.getLong(2))
      val (scanned, matching, frac) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nRead >= 1 && nRead <= nPart, "a quartile probe must read some partitions")
      assert(scanned >= matching, "partition scan must be a superset of the match set")
      assert(nRead < nPart, "a quartile probe must also PRUNE partitions")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // day-granular probe edges fall inside months somewhere: at least one
    // probe pays the partition-granularity false-positive cost
    assert(rows.exists(r => r.getLong(3) > r.getLong(4)),
      "no probe shows scanned > matching — the edge-cost claim is untested")
  }

  test("z05 layout extremes: clustered keys depth ~1, scattered keys depth ~n_files") {
    import spark.implicits._
    // clustered: partkey == orderkey -> both range-bucket layouts give
    // 64 disjoint [lo,hi] ranges -> every file's depth is exactly 1
    val clustered = (1L to 6400L).map(i => (i, i)).toDF("l_orderkey", "l_partkey")
    val c = Layout.overlapDepth(clustered).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(c("arrival") === ((64L, 64L, 1L, 1.0)), "disjoint ranges -> depth 1 everywhere")
    assert(c("sorted") === ((64L, 64L, 1L, 1.0)))
    // scattered: a multiplicative shuffle makes every arrival file span
    // ~the whole key domain -> all-overlap (depth = n_files); the
    // key-sorted layout of the SAME rows stays near depth 1
    val scattered = (1L to 6400L).map(i => (i, (i * 37L) % 6400L + 1L))
      .toDF("l_orderkey", "l_partkey")
    val sc = Layout.overlapDepth(scattered).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    assert(sc("arrival")._2 === 64L && sc("arrival")._3 >= 32.0,
      "scattered arrival layout must show deep overlap")
    assert(sc("sorted")._3 <= 3.0, "re-clustering the same rows restores shallow depth")
  }

  test("z06 bloom extremes: shared key skips nothing exactly; unique keys skip without false negatives") {
    import spark.implicits._
    // every file holds the SAME key: all probes snap to it, every file
    // passes AND contains — zero false positives, zero skipping
    val shared = (0L until 128L).map(ok => (ok, 5L)).toDF("l_orderkey", "l_partkey")
    Layout.bloomSkipping(shared).collect().foreach { r =>
      assert(r.getLong(1) === 5L)                       // key
      assert(r.getLong(3) === r.getLong(2))             // n_pass = n_files
      assert(r.getLong(4) === r.getLong(2))             // n_containing = n_files
      assert(r.getLong(5) === 0L && r.getDouble(7) === 0.0)
    }
    // one key per file: containment is exactly 1 file; the bloom may only
    // ADD files (no false negatives: pass ⊇ contain ⇒ n_pass ≥ 1)
    val unique = (0L until 128L).map(ok => (ok, ok / 2)).toDF("l_orderkey", "l_partkey")
    val got = Layout.bloomSkipping(unique).collect()
    assert(got.length === 8)
    got.foreach { r =>
      assert(r.getLong(2) === 64L)
      assert(r.getLong(4) === 1L, "each key lives in exactly one file")
      assert(r.getLong(3) >= 1L && r.getLong(5) >= 0L,
        "bloom must pass the containing file (no false negatives)")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
    // with 64 files × 2 bits in a 2^14-bit space, collisions are rare:
    // the average probe should skip most files
    val meanPass = got.map(_.getLong(3)).sum.toDouble / got.length
    assert(meanPass <= 8.0, s"expected strong skipping, mean pass = $meanPass")
  }

  test("z07 advisor: one winner per probe, and on 2-D boxes it must be z-order") {
    val rows = Layout.queries("z07_layout_advisor")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.length === 12, "4 probes x 3 layouts")
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq === Seq("arrival", "pksort", "zorder"))
      // exactly one winner, and it is the row with the fewest scanned rows
      val best = g.filter(_._8)
      assert(best.length === 1, s"probe $q winners: ${best.toSeq}")
      assert(best.head._5 === g.map(_._5).min, s"probe $q winner not minimal")
      // zone maps never under-scan: scanned >= matching everywhere
      g.foreach(r => assert(r._5 >= r._6, s"probe $q ${r._2} under-scans"))
    }
    val byLayout = rows.groupBy(_._2)
    // arrival order is uncorrelated with (partkey, suppkey): files span
    // ~the whole key domain and essentially nothing is skippable (at the
    // tiny spec fixture an occasional near-empty file does prune — hence
    // >= 0.95, not == 1.0; sf0.01+ measures exactly 1.0)
    byLayout("arrival").foreach(r => assert(r._7 >= 0.95, s"arrival should scan ~all: $r"))
    // the single-key sort prunes ONE dimension (~1/4 on quartile boxes);
    // the interleave prunes both — strictly better on every 2-D probe
    rows.groupBy(_._1).foreach { case (q, g) =>
      val by = g.map(r => r._2 -> r._5).toMap
      assert(by("zorder") < by("pksort") && by("pksort") < by("arrival"),
        s"probe $q expected zorder < pksort < arrival, got $by")
    }
    assert(byLayout("zorder").forall(_._8), "z-order should win every 2-D probe here")
  }
}
