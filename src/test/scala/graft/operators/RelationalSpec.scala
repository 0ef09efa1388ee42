package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-row coverage for v01's maintenance identity — the shipped
  * lineitem split puts every (flag, status) group in both base and
  * delta, so the delta-only-group and empty-delta merge paths would
  * otherwise be unexercised by the oracle gate.
  */
class RelationalSpec extends SparkSpec {

  private def li(rows: Seq[(Long, String, String, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_returnflag", "l_linestatus",
      "l_quantity", "l_extendedprice")
  }

  private def fullRecompute(rows: Seq[(Long, String, String, Double, Double)]) =
    li(rows).groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double").as("sum_base_price"),
        (sum(col("l_quantity").cast("decimal(38,6)")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  test("v01 merge identity: delta-only group, base-only group, empty delta") {
    // group (N,O): only orderkeys % 10 == 0 → lives ONLY in the delta;
    // group (R,F): only non-multiples → base only; group (A,F): both
    val rows = Seq(
      (10L, "N", "O", 1.5, 100.0), (20L, "N", "O", 2.5, 50.0),  // delta-only group
      (1L, "R", "F", 3.0, 10.0), (2L, "R", "F", 4.0, 20.0),     // base-only group
      (3L, "A", "F", 5.0, 30.0), (40L, "A", "F", 6.0, 40.0)     // split group
    )
    val got = Relational.incrementalAgg(li(rows)).collect().map(_.toSeq).toSeq
    val exp = fullRecompute(rows).collect().map(_.toSeq).toSeq
    assert(got === exp)
    assert(got.length === 3)
  }

  test("v01 merge identity: empty delta leaves base state unchanged") {
    val rows = Seq(
      (1L, "R", "F", 3.0, 10.0), (2L, "N", "O", 4.0, 20.0), (3L, "A", "F", 5.0, 30.0))
    val got = Relational.incrementalAgg(li(rows)).collect().map(_.toSeq).toSeq
    val exp = fullRecompute(rows).collect().map(_.toSeq).toSeq
    assert(got === exp)
  }
}
