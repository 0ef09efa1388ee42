package graft.operators

import graft.SparkSpec

/** The salting combinators on a deliberately pathological key
  * distribution — the oracle gate proves fixture equality, this proves
  * the semantics on the distribution salting exists for: one key owning
  * ~all rows.
  */
class SkewSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("saltedJoin on a 95%-hot key equals the unsalted join") {
    import spark.implicits._
    // 9500 rows on key "hot", 500 spread over 5 cold keys
    val probe = (1 to 10000).map { i =>
      val k = if (i <= 9500) "hot" else s"cold${i % 5}"
      (k, i.toLong, (i % 97).toLong)
    }.toDF("k", "row_id", "v")
    val build = Seq(("hot", 2L), ("cold0", 3L), ("cold1", 5L), ("cold2", 7L),
      ("cold3", 11L), ("cold4", 13L), ("never", 99L)).toDF("k", "mult")

    val salted = Skew.saltedJoin(probe, build, "k", col("row_id"), salts = 16)
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("mult")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = probe.join(build, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("mult")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain, "salting must be answer-invisible")
    assert(plain.exists(_._1 == "hot") && !plain.exists(_._1 == "never"))
  }

  test("saltedJoin spreads the hot key across more than one shuffle partition") {
    import spark.implicits._
    val probe = (1 to 8000).map(i => ("hot", i.toLong, 1L)).toDF("k", "row_id", "v")
    val build = Seq(("hot", 1L)).toDF("k", "mult")
    // group the SALTED intermediate by its physical partition: >1 distinct
    // partition must carry hot-key rows (the unsalted join puts them all
    // in one)
    val salted = probe.withColumn("salt", pmod(hash(col("row_id")), lit(16)))
      .repartition(16, col("k"), col("salt"))
    val partsUsed = salted
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(partsUsed > 1, s"hot key still lands on one partition ($partsUsed)")
  }

  test("hotKeyIsolatedJoin on a 95%-hot key equals the plain join; both routes fire") {
    import spark.implicits._
    // "hot" owns 9500 of 10000 probe rows (mean ≈ 1667 over 6 keys, so
    // only "hot" clears the 4/3·mean threshold); build has an extra key
    // the probe never references (must not appear — inner-join semantics)
    val probe = (1 to 10000).map { i =>
      val k = if (i <= 9500) "hot" else s"cold${i % 5}"
      (k, i.toLong)
    }.toDF("k", "v")
    val build = Seq(("hot", 2L), ("cold0", 3L), ("cold1", 5L), ("cold2", 7L),
      ("cold3", 11L), ("cold4", 13L), ("never", 99L)).toDF("k", "mult")

    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("mult")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val routed = summarize(Skew.hotKeyIsolatedJoin(probe, build, "k"))
    val plain = summarize(probe.join(build, "k"))
    assert(routed === plain, "hot/cold routing must be answer-invisible")
    assert(plain.exists(_._1 == "hot") && !plain.exists(_._1 == "never"))

    // cold-only distribution: threshold admits nothing, the broadcast
    // route is empty, and the result is still exactly the plain join
    val uniform = (1 to 1000).map(i => (s"cold${i % 5}", i.toLong)).toDF("k", "v")
    assert(summarize(Skew.hotKeyIsolatedJoin(uniform, build, "k")) ===
      summarize(uniform.join(build, "k")))

    // bimodal overflow: both "hot" keys clear 4/3×mean, but maxHotKeys=1
    // routes only the TOP one through the broadcast — the other stays on
    // the cold shuffle path and the result is STILL exactly the plain
    // join (the cap degrades gracefully instead of growing the broadcast)
    val bimodal = (1 to 10000).map { i =>
      val k = if (i <= 4700) "hotA" else if (i <= 9400) "hotB" else s"cold${i % 5}"
      (k, i.toLong)
    }.toDF("k", "v")
    val bibuild = Seq(("hotA", 2L), ("hotB", 3L), ("cold0", 5L), ("cold1", 7L),
      ("cold2", 11L), ("cold3", 13L), ("cold4", 17L)).toDF("k", "mult")
    assert(summarize(Skew.hotKeyIsolatedJoin(bimodal, bibuild, "k", maxHotKeys = 1)) ===
      summarize(bimodal.join(bibuild, "k")))
  }

  test("AQE skew-join split fires on a hot partition and stays answer-invisible") {
    import spark.implicits._
    // ~16 MB of rows on ONE key vs a few KB on the cold keys: with the
    // skew thresholds lowered, AQE must mark the sort-merge join
    // skew-handled (isSkewJoin) and split the hot partition — the
    // config-level leg of the skew triptych (k01/k02 salting, k03
    // isolation) made machine-checkable. Result must equal the plain
    // join semantics regardless.
    val probe = (1 to 400000).map { i =>
      (if (i <= 390000) "hot" else s"cold${i % 7}", i.toLong)
    }.toDF("k", "v")
    val build = (Seq("hot") ++ (0 until 7).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, m) => (k, m.toLong + 2L) }.toDF("k", "mult")
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      // GLOBAL aggregate downstream, not a keyed one: a groupBy(k) after
      // the join would REQUIRE the join's hash distribution, and AQE
      // (correctly) refuses to split a skewed partition when that breaks
      // a downstream requirement — the split is legal only when nothing
      // downstream needs the join's partitioning (or with
      // forceOptimizeSkewedJoin, which trades an extra shuffle)
      val joined = probe.join(build.hint("merge"), "k")
        .agg(count(lit(1)).as("n"), sum(col("v") * col("mult")).as("s"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$plan")
      val expect = probe.join(build, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") * col("mult")).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      assert(got === expect, "skew splitting must be answer-invisible")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedSumCount on the hot distribution equals plain groupBy") {
    import spark.implicits._
    val df = (1 to 5000).map { i =>
      (if (i % 100 == 0) "rare" else "hot", i.toLong, i.toDouble / 7.0)
    }.toDF("k", "row_id", "v")
    val salted = Skew.saltedSumCount(df, col("k"), col("row_id"), col("v"), salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(38,6)")).cast("double").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("k04 salt plan: ceil arithmetic bounds the post-salt load by the target") {
    // mathematical contract of the plan: salt_factor = ceil(n/target) ≥ 1
    // and the projected per-reducer load ceil(n/salt_factor) ≤ target
    // whenever n ≥ 1 (and equals n when n ≤ target → factor 1)
    val got = Skew.queries("k04_salt_plan")(spark, sfDir).collect()
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { r =>
      val (n, t, f, load) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(f >= 1L && f === (n + t - 1) / t)
      assert(load <= t, s"post-salt load $load exceeds target $t")
      if (n <= t) assert(f === 1L && load === n)
    }
  }

  test("k05 balance audit: full grid, conserved masses, keys land whole, flags consistent") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, sfDir)
    val rows = Skew.queries("k05_hash_balance")(spark, sfDir).collect()
    assert(rows.length === 32, "every partition appears, loaded or empty")
    assert(rows.map(_.getLong(1)).sum === e.count(), "row mass conserved")
    // each TYPE hashes to exactly one partition — key mass conserved too
    assert(rows.map(_.getLong(2)).sum === e.select("event_type").distinct().count())
    val total = rows.head.getLong(3)
    rows.foreach { r =>
      val (n, t) = (r.getLong(1), r.getLong(3))
      assert(t === total)
      assert(r.getDouble(4) === n.toDouble * 32.0 / t.toDouble)
      assert(r.getBoolean(5) === (n * 32L > t * 2L))
    }
    // with a handful of event types, most of the 32 partitions are empty
    // — the per-KEY skew this module's operators exist to fix
    assert(rows.count(_.getLong(1) === 0L) >= 16,
      "low-cardinality key must leave most partitions empty")
  }
}
