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
    })
  )

  def oracles: Map[String, String] = Map(
    "k01_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
