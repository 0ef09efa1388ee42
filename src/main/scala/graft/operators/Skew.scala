package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation operators. At 100 TB a handful of hot keys (one huge
  * customer, one dominant event_type) turn a single shuffle partition into
  * the job's critical path; the standard fixes are (a) AQE skew-join
  * splitting (config, free) and (b) explicit salting, which also covers
  * aggregation skew that AQE does not rebalance when a single KEY (not
  * partition) is hot. This module implements (b) as a reusable combinator.
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 aggregates on (key, salt) —
    * spreading a hot key over `salts` reducers — stage 2 merges the salted
    * partials. Correct for any algebraic aggregate (sum/count/min/max);
    * the result is exactly the unsalted groupBy.
    *
    * The salt must be deterministic per row (retries must re-salt
    * identically, or shuffle-file reuse double-counts): derived from a
    * row-identity column, never rand().
    */
  def saltedSumCount(df: DataFrame, key: Column, rowId: Column, value: Column,
                     salts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(rowId), lit(salts)).as("salt"))
      .agg(sum(value.cast("decimal(38,6)")).as("partial_sum"),
        count(lit(1)).as("partial_n"))
      .groupBy("k")
      .agg(sum(col("partial_sum")).cast("double").as("sum_value"),
        sum(col("partial_n")).as("n"))

  /** Salted JOIN — the join-side counterpart of saltedSumCount, for when
    * one probe-side key is hot enough that even AQE's partition splitting
    * leaves a straggler (AQE splits skewed PARTITIONS; a single hot KEY
    * inside one partition still lands on one reducer unless salted).
    * Probe rows get a deterministic salt in [0, salts); the build side is
    * replicated ×salts via explode, so (key, salt) is a plain equi-join
    * with the hot key spread over `salts` reducers. Result == the
    * unsalted join, which is what the oracle states.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeRowId: Column, salts: Int): DataFrame = {
    val salted = probe.withColumn("salt", pmod(hash(probeRowId), lit(salts)))
    val replicated = build.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "salt")).drop("salt")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // salted aggregation over the (deliberately low-cardinality, hence
    // "all keys hot") l_returnflag key. Result == plain groupBy, so the
    // oracle is the unsalted SQL — decimal partials re-merge exactly.
    "k01_salted_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // row identity hashed directly from the two longs — a concat_ws
      // string detour would pay a per-row build+hash-of-string tax
      saltedSumCount(li, col("l_returnflag"),
        hash(col("l_orderkey"), col("l_linenumber")),
        col("l_extendedprice"), salts = 16)
        .select(col("k").as("l_returnflag"), col("sum_value"), col("n"))
        .orderBy("l_returnflag")
    }),

    // salted join: every lineitem keyed by the (5-value, hence all-hot)
    // l_returnflag joins a tiny per-flag dimension built from orders'
    // priority universe — the "hot key × small build side" shape. The
    // salt spreads each flag over 16 reducers; the aggregate proves the
    // join result is exactly the unsalted join's.
    "k02_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      // deterministic 5-row "dimension": per-flag multiplier table
      val dim = li.select(col("flag")).distinct()
        .withColumn("mult", (length(col("flag")) + lit(1)).cast("long"))
      saltedJoin(li, dim, "flag", hash(col("l_orderkey"), col("l_linenumber")), salts = 16)
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum((col("l_quantity").cast("decimal(38,6)") * col("mult")).cast("decimal(38,6)"))
            .cast("double").as("weighted_qty"))
        .orderBy("flag")
    })
  )

  def oracles: Map[String, String] = Map(
    "k01_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // the UNSALTED join — salting must be answer-invisible
    "k02_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |    CAST(LENGTH(l_returnflag) + 1 AS BIGINT) AS mult
        |  FROM lineitem
        |)
        |SELECT li.l_returnflag AS flag, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(38,6)) * mult AS DECIMAL(38,6))) AS DOUBLE) AS weighted_qty
        |FROM lineitem li JOIN dim ON li.l_returnflag = dim.flag
        |GROUP BY li.l_returnflag
        |ORDER BY flag""".stripMargin
  )
}
