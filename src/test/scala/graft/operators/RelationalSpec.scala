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

  private def changes(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts_sec", "event_type", "value")
  }

  test("v02 scd2: tombstone closes the open version without opening one") {
    // user 1: view → click → DELETE → purchase (delete mid-history:
    // click's validity ends at the tombstone ts; purchase reopens);
    // user 2: view → DELETE as the last change (no current row);
    // user 3: a single change (current from its own ts)
    val got = Relational.scd2History(changes(Seq(
      (1L, 1L, 100L, "view", 1.0), (1L, 2L, 200L, "click", 2.0),
      (1L, 3L, 300L, "error", 0.0), (1L, 4L, 400L, "purchase", 3.0),
      (2L, 5L, 100L, "view", 1.0), (2L, 6L, 150L, "error", 0.0),
      (3L, 7L, 500L, "view", 9.0)
    ))).orderBy("user_id", "version_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4), Option(r.get(5)), r.getBoolean(6))).toSeq
    assert(got === Seq(
      (1L, 1L, "view", 1.0, 100L, Some(200L), false),
      (1L, 2L, "click", 2.0, 200L, Some(300L), false), // closed BY the delete
      (1L, 3L, "purchase", 3.0, 400L, None, true),
      (2L, 1L, "view", 1.0, 100L, Some(150L), false),  // dead key: no current
      (3L, 1L, "view", 9.0, 500L, None, true)))
  }

  test("v02 scd2 on the fixture: intervals well-formed, ≤1 current per user") {
    val rows = graft.SparkEntry.queries("v02_scd2_history")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(5) || r.getLong(5) >= r.getLong(4)),
      "a version's valid_to must not precede its valid_from")
    val currents = rows.filter(_.getBoolean(6)).groupBy(_.getLong(0))
    assert(currents.values.forall(_.length == 1),
      "at most one is_current version per user")
  }

  test("v04 snapshot-as-of: covering interval picked; pre-birth, post-tombstone, boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = 1000L
    // u1: v1 [100,500) v2 [500,∞) → v2 current at T
    // u2: [100,900) then tombstone at 900 → absent at T
    // u3: first change at 1500 → absent at T
    // u4: interval ends exactly at T [100,1000) → EXCLUDED (valid_to > T strict),
    //     successor [1000,∞) included (valid_from ≤ T inclusive)
    val changes = Seq(
      (1L, 1L, 100L, "view", 1.0), (1L, 2L, 500L, "click", 2.0),
      (2L, 3L, 100L, "view", 3.0), (2L, 4L, 900L, "error", 0.0),
      (3L, 5L, 1500L, "view", 4.0),
      (4L, 6L, 100L, "view", 5.0), (4L, 7L, 1000L, "click", 6.0)
    ).toDF("user_id", "event_id", "ts_sec", "event_type", "value")
    val got = Relational.scd2History(changes)
      .filter(col("valid_from") <= T && (col("valid_to").isNull || col("valid_to") > T))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> (("click", 500L)),
      4L -> (("click", 1000L))),
      "snapshot must pick exactly the covering interval per surviving user")
  }

  test("v05 snapshot diff: all four status legs on crafted chains") {
    import spark.implicits._
    val (t1, t2) = (1000L, 2000L)
    // u1 unchanged (one version spans both); u2 changed (new version in
    // the window); u3 removed (tombstone at 1500 closes without opening);
    // u4 added (first change after t1); u5 born and tombstoned INSIDE
    // the window — in neither snapshot, absent entirely
    val changes = Seq(
      (1L, 1L, 500L, "view", 1.0),
      (2L, 2L, 500L, "view", 2.0), (2L, 3L, 1500L, "click", 3.0),
      (3L, 4L, 500L, "view", 4.0), (3L, 5L, 1500L, "error", 0.0),
      (4L, 6L, 1500L, "view", 5.0),
      (5L, 7L, 1200L, "view", 6.0), (5L, 8L, 1800L, "error", 0.0)
    ).toDF("user_id", "event_id", "ts_sec", "event_type", "value")
    val got = Relational.snapshotDiff(Relational.scd2History(changes), t1, t2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L))
  }

  test("v03 partition refresh == full recompute across all touch patterns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // months: 'A' untouched (stale passes through), 'B' mixed base+delta
    // (recomputed from BOTH populations), 'C' delta-only (absent from the
    // stale MV — must come wholly from the refresh), 'D' untouched with a
    // repeated customer (distinct-count survives pass-through)
    val o = Seq(
      (1L, 10L, 5.0, "A"), (2L, 11L, 7.0, "A"),
      (3L, 10L, 1.0, "B"), (4L, 12L, 2.0, "B"), (100L, 12L, 4.0, "B"),
      (101L, 13L, 8.0, "C"), (102L, 13L, 16.0, "C"),
      (5L, 14L, 3.0, "D"), (6L, 14L, 9.0, "D")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "month")
    val isDelta = col("o_orderkey") >= 100L

    val got = Relational.partitionRefresh(o, isDelta).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val full = o.groupBy("month")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("s"),
        countDistinct(col("o_custkey")).as("c"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got === full, "refresh identity: result must equal the full recompute")
    assert(got("C") === ((2L, 24.0, 1L)), "delta-only month comes from the refresh alone")
    assert(got("B") === ((3L, 7.0, 2L)), "mixed month recomputes over base ∪ delta")
    assert(got("D") === ((2L, 12.0, 1L)), "untouched distinct-count passes through")
  }

  test("v06 closed forms: shared-sequence dirty, boundary doc, deletion-free source") {
    import spark.implicits._
    // SeqBudget = 512, ChunkStride = 150 (TextAnalysis constants).
    // A: deleted doc 0 (100 tokens, 199 chars) + doc 1 (500 tokens):
    //    stream cums 100/600 -> totals (599//512)+1 = 2; doc 0 covers
    //    seq 0 only, SHARED with doc 1's head -> 1 dirty of 2;
    //    chunks (198//150)+1 = 2.
    // B: one 10-token doc, nothing deleted -> all zeros, 1 sequence.
    // C: deleted doc 53 with EXACTLY 512 tokens then doc 54 with 512:
    //    doc 53 covers seq 0 exactly (511//512 = 0 - the boundary doc
    //    must NOT bleed into seq 1); chunks (1022//150)+1 = 7.
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, "A", words(100)), (1L, "A", words(500)),
      (2L, "B", words(10)),
      (53L, "C", words(512)), (54L, "C", words(512))
    ).toDF("doc_id", "source", "text")
    val got = Relational.deletePropagation(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got("A") === ((1L, 2L, 1L, 2L, 0.5)))
    assert(got("B") === ((0L, 0L, 0L, 1L, 0.0)))
    assert(got("C") === ((1L, 7L, 1L, 2L, 0.5)))
  }
}
