package graft.functions

import graft.{SparkEntry, SparkSpec}

class TopKAggregatorSpec extends SparkSpec {

  private val agg = new TopKAggregator(3)

  test("buffer laws: bounded at k, sorted best-first, deterministic tie-break") {
    val rows = Seq(
      ScoredId(1.0, 5), ScoredId(3.0, 2), ScoredId(2.0, 9),
      ScoredId(3.0, 1), ScoredId(0.5, 7), ScoredId(2.0, 3))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length === 3)
    // score DESC, id ASC on the 3.0 tie
    assert(buf === Seq(ScoredId(3.0, 1), ScoredId(3.0, 2), ScoredId(2.0, 3)))
    // merge of disjoint partial buffers == reduce over the union, any split
    for (cut <- 1 until rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === buf, s"split at $cut")
    }
  }

  test("q38 plans as two-phase aggregation, not a window sort") {
    val p = SparkEntry.queries("q38_topk_per_group")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"top-k per group must not plan a window:\n$p")
    // partial + final object hash aggregate (typed Aggregator path)
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final aggregation:\n$p")
  }
}
