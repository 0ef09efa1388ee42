package graft.operators

import graft.SparkSpec

/** Crafted-event coverage for the funnel's distinctive semantics — the
  * shipped fixture takes every user to stage 3, so the stall paths (left
  * joins, stage arithmetic, strict temporal order) would otherwise be
  * unexercised by the oracle gate.
  */
class TemporalSpec extends SparkSpec {

  test("funnel stall paths: view-only, mid-funnel, click-before-view, strict order") {
    import spark.implicits._
    val e = Seq(
      (1L, "view", 100L),                                               // stage 1: view only
      (2L, "view", 100L), (2L, "click", 150L),                          // stage 2: no purchase
      (3L, "click", 50L), (3L, "view", 100L), (3L, "purchase", 200L),   // click BEFORE view ⇒ stage 1
      (4L, "view", 100L), (4L, "click", 150L), (4L, "purchase", 200L),  // full funnel
      (5L, "click", 10L), (5L, "purchase", 20L),                        // never viewed ⇒ absent
      (6L, "view", 100L), (6L, "click", 100L),                          // same-second click: strict > excludes ⇒ stage 1
      (7L, "view", 100L), (7L, "purchase", 150L), (7L, "click", 200L)   // purchase precedes the click ⇒ stage 2
    ).toDF("user_id", "event_type", "sec")

    val got = Temporal.funnel(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), Option(r.getString(2)), Option(r.getString(3))))
      .toMap

    assert(got.keySet === Set(1L, 2L, 3L, 4L, 6L, 7L), "users with no view must be absent")
    assert(got(1L)._1 === 1L && got(1L)._2.isEmpty)
    assert(got(2L)._1 === 2L && got(2L)._2.isDefined && got(2L)._3.isEmpty)
    assert(got(3L)._1 === 1L, "a click before the first view must not count")
    assert(got(4L)._1 === 3L && got(4L)._3.isDefined)
    assert(got(6L)._1 === 1L, "same-second click fails the strict > ordering")
    assert(got(7L)._1 === 2L, "a purchase before the click must not complete the funnel")
  }
}
