package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import graft.{SparkEntry, SparkSpec}

/** Plan-shape regressions: these properties ARE the 100 TB story, so they
  * are pinned as tests — a refactor that silently drops a pushdown or
  * turns a broadcast join into a shuffle would pass value-equality tests
  * and still be a disaster at scale.
  */
class PlanShapeSpec extends SparkSpec {

  private def sparkPlan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++ p.subqueries.flatMap(s => collectAll(s)(pf))

  test("q02: all predicates push into the parquet scan; only needed columns read") {
    val scans = collectAll(sparkPlan("q02_filter_project")) { case f: FileSourceScanExec => f }
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") && pushed.contains("LessThan(l_quantity"),
      s"missing pushdown: $pushed")
    // 4 used columns + 2 filter-only columns; a 16-column read would mean pruning broke
    assert(scans.head.requiredSchema.size <= 6,
      s"column pruning regressed: ${scans.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q03: dimension join is a broadcast hash join (no fact-side shuffle)") {
    val p = sparkPlan("q03_join_broadcast")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty, p.toString)
  }

  test("q04: fact-fact join is sort-merge as hinted") {
    val p = sparkPlan("q04_join_sortmerge")
    assert(collectAll(p) { case j: SortMergeJoinExec => j }.nonEmpty, p.toString)
  }

  test("q05: all three dimension joins broadcast") {
    // exchanges are inserted by plan preparation, so count the join nodes
    val p = sparkPlan("q05_star_join")
    val n = collectAll(p) { case j: BroadcastHashJoinExec => j }.size
    assert(n >= 3, s"expected >=3 broadcast hash joins (customer/nation/region), got $n")
  }

  test("q09: global top-k plans as TakeOrderedAndProject, never a full sort") {
    val p = sparkPlan("q09_topk")
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty, p.toString)
    assert(collectAll(p) { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      "global SortExec should not appear for a limit-k query")
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = sparkPlan("q01_agg_pricing_summary")
    val aggs = collectAll(p) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.size >= 2, s"expected partial+final HashAggregate, got ${aggs.size}")
  }

  test("AQE is on and coalesces post-shuffle partitions to the data, not the config") {
    // at 100 TB the shuffle-partition CONFIG is always wrong for some
    // stage; AQE re-planning (partition coalescing, skew splits, runtime
    // join demotion) is what makes one config survive every stage. Pin
    // that it is active: a small aggregate must execute with fewer
    // partitions than spark.sql.shuffle.partitions.
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true", "AQE must stay on")
    val df = SparkEntry.queries("q01_agg_pricing_summary")(spark, sfDir)
    df.collect() // execute THIS QueryExecution so AQE finalizes it in place
    val shuffleReads = df.queryExecution.executedPlan.toString
    assert(shuffleReads.contains("AQEShuffleRead") || shuffleReads.contains("coalesced"),
      s"expected AQE-coalesced shuffle read in:\n$shuffleReads")
  }

  test("t07: the eval-shingle side broadcasts (train side never shuffles by shingle)") {
    // at 100 TB the train side dwarfs the eval benchmark; the join must
    // ship the eval shingles to the data, not re-shuffle the corpus
    val p = sparkPlan("t07_decontaminate")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty, p.toString)
  }

  test("t10: chunking is generate-only — zero exchanges before the output sort") {
    // the chunker must stay a narrow map+generate; any exchange here would
    // shuffle the full corpus text (the orderBy is presentation-only and
    // sorts CHUNKS, which is unavoidable for a deterministic dump)
    val p = sparkPlan("t10_chunk_docs")
    val gens = collectAll(p) { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, "expected GenerateExec (explode) in the chunk plan")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.isEmpty &&
      collectAll(p) { case j: SortMergeJoinExec => j }.isEmpty,
      "chunking must not join")
  }

  test("t13: the bloom probe filters the corpus BEFORE the verify join, which broadcasts") {
    val df = SparkEntry.queries("t13_bloom_decontaminate")(spark, sfDir)
    val p = df.queryExecution.sparkPlan
    // the exact verify join ships eval hashes to the data
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty, p.toString)
    // and the bloom probe sits in a filter upstream of it — scan-side
    // pre-pruning is the whole point of the operator
    val filters = collectAll(p) { case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filters.exists(_.condition.toString.toLowerCase.contains("might_contain")),
      s"expected a might_contain filter in:\n${filters.map(_.condition).mkString("\n")}")
  }

  test("e08: centroid assignment broadcasts; no sort-merge anywhere in the step") {
    // the corpus must never shuffle to meet the centroids — at 100 TB the
    // centroid table is KBs and the corpus is the 100 TB
    val p = sparkPlan("e08_kmeans_step")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty ||
      collectAll(p) { case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }.nonEmpty,
      p.toString)
    assert(collectAll(p) { case j: SortMergeJoinExec => j }.isEmpty,
      "no sort-merge join should appear in the k-means step")
  }

  test("p01: the curation pipeline contains no nested-loop join anywhere") {
    // the near-dedup stage must stay a banded equi-join; a cartesian or
    // BroadcastNestedLoop appearing here means the LSH candidate
    // generation degraded to an all-pairs comparison
    val p = sparkPlan("p01_curation_pipeline")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "quadratic join in the curation pipeline")
  }

  test("d03: LSH candidate generation is equi-join only (no quadratic fallback)") {
    // the catalog entry reads the per-JVM fixture (a flat scan — nothing
    // to pin); the shape that matters at 100 TB is the BUILD pipeline's
    val p = graft.operators.Dedup.nearDupPairsBuild(spark, sfDir)
      .queryExecution.sparkPlan
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "quadratic join in the LSH path")
    assert(collectAll(p) { case g: org.apache.spark.sql.execution.GenerateExec => g }.nonEmpty,
      "expected the band explode")
  }

  test("q43: LATERAL subquery decorrelates to WindowGroupLimit, never a per-row loop") {
    // the per-customer ORDER BY ... LIMIT 3 must lower to the rank-pushdown
    // operator (map-side top-k before the shuffle) + a hash join; a
    // CartesianProduct or BroadcastNestedLoop here would mean the lateral
    // re-executes per outer row — the shape that dies at scale
    val p = sparkPlan("q43_lateral_topk")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "lateral failed to decorrelate")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty, "expected WindowGroupLimit rank pushdown")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty ||
      collectAll(p) { case j: SortMergeJoinExec => j }.nonEmpty, p.toString)
  }

  test("g01: wedge closure is equi-joins only (degree orientation keeps it bounded)") {
    val p = sparkPlan("g01_triangle_count")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.size <= 2, // the two 1-row stat crossJoins at the top are fine
      "unexpected quadratic join in the triangle core")
  }

  test("e07: quantization is one explode pass, no join, two-phase final agg") {
    val p = sparkPlan("e07_vector_quantize")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.isEmpty &&
      collectAll(p) { case j: SortMergeJoinExec => j }.isEmpty,
      "quantization must not join")
    val aggs = collectAll(p) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.size >= 2, s"expected partial+final HashAggregate, got ${aggs.size}")
  }

  test("q44: all FILTER-clause aggregates fuse into ONE two-phase hash agg") {
    // the point of FILTER over N separate scans: however many predicated
    // aggregates, the plan stays a single partial+final aggregation pair
    // over a single scan
    val p = sparkPlan("q44_filter_agg")
    val aggs = collectAll(p) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.size == 2, s"expected exactly partial+final HashAggregate, got ${aggs.size}")
    val scans = collectAll(p) { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
  }

  test("t16: term-frequency agg partial-aggregates; no join ships raw text") {
    // the (source, token) agg must combine map-side (the shuffle carries
    // distinct types, not token occurrences), and the only join in the
    // query is the per-source top-token join-back on the SOURCE key —
    // raw text appears in no join
    val p = sparkPlan("t16_vocab_stats")
    val aggs = collectAll(p) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.size >= 4, s"expected partial+final pairs for tf and rollup aggs, got ${aggs.size}")
    val joined = collectAll(p) {
      case j: BroadcastHashJoinExec => j.output.map(_.name)
      case j: SortMergeJoinExec => j.output.map(_.name)
    }.flatten
    assert(!joined.contains("text"), "raw text must not ride through any join")
  }

  test("q46: unpivot plans as Expand — a generate, not a shuffle or join") {
    val p = sparkPlan("q46_unpivot")
    assert(collectAll(p) { case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty,
      "native unpivot should plan as ExpandExec")
    assert(collectAll(p) {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.isEmpty, "unpivot must not introduce a join")
  }

  test("q48: variant parse + typed extraction stays inside whole-stage codegen") {
    // the engine-level point of VariantType: parse once, extract at
    // column speed — the parse/extract projection must fuse into a
    // codegen stage (starred Project), not fall back to interpreted
    // row-at-a-time evaluation. Asserted on the scan+project core (the
    // full query's AQE wrapper hides codegen marks until execution).
    import org.apache.spark.sql.functions.{col, parse_json, variant_get}
    val exec = graft.Tables.events(spark, sfDir)
      .select(variant_get(parse_json(col("props")), "$.k", "int").as("k"))
      .queryExecution.executedPlan.toString
    assert(!exec.contains("CodegenFallback"), s"codegen fallback leaked into:\n$exec")
    assert(exec.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"variant projection not fused into codegen:\n$exec")
  }

  test("d10: containment joins are all equi-joins — no quadratic operator") {
    val p = sparkPlan("d10_containment")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "containment must never plan a quadratic join")
  }

  test("m08: scene detection is a narrow map (no shuffle before the output sort)") {
    val exchanges = collectAll(sparkPlan("m08_scene_change")) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // only the deterministic final ORDER BY may shuffle
    assert(exchanges.size <= 1, s"scene detection should not shuffle: $exchanges")
  }

  test("t18: span df joins on the span key only; raw text rides no join") {
    val joined = collectAll(sparkPlan("t18_boilerplate_spans")) {
      case j: BroadcastHashJoinExec => j.output.map(_.name)
      case j: SortMergeJoinExec => j.output.map(_.name)
    }.flatten
    assert(!joined.contains("text"), "raw text must not ride through any join")
  }

  test("t19: the CMS probe filters BEFORE the exact count's shuffle") {
    // the whole point of the sketch prefilter: the Filter carrying
    // cms_min_count must sit under the Exchange that feeds the exact
    // per-gram count, so only surviving occurrences are shuffled
    val p = sparkPlan("t19_heavy_hitters")
    val lines = p.toString.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("cms_min_count"))
    assert(filterIdx >= 0, s"no cms_min_count filter in plan:\n${lines.mkString("\n")}")
    // printed plans are root-first: everything after the filter line is
    // UPSTREAM of it, and must contain no exchange — the probe reads the
    // scan narrowly, so only post-filter survivors ever shuffle
    assert(!lines.drop(filterIdx + 1).exists(_.contains("Exchange")),
      s"cms prefilter must filter at scan level, before any shuffle:\n${lines.mkString("\n")}")
  }

  test("m09: candidates come from equi-joins only — no quadratic operator") {
    val p = sparkPlan("m09_phash_neardup")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "phash near-dup must never plan a quadratic join")
  }

  test("p02: the training-mix manifest is scan + one two-phase agg — zero joins") {
    val p = sparkPlan("p02_training_mix")
    assert(collectAll(p) {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "the mix manifest must not join")
    val scans = collectAll(p) { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"expected one documents scan, got ${scans.size}")
  }

  test("q52: sketch build partial-aggregates map-side (fixed-size state crosses the shuffle)") {
    // The 100 TB claim: what shuffles is a few-KB HLL binary per
    // (event_type, map partition), never user_id rows. DataSketches aggs
    // plan as ObjectHashAggregate; a partial mode before the exchange is
    // the map-side combine.
    val p = sparkPlan("q52_sketch_union")
    val objAggs = collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    assert(objAggs.size >= 2, s"expected partial+final ObjectHashAggregate, got ${objAggs.size}")
    val partialSketch = objAggs.exists(_.aggregateExpressions.exists(ae =>
      ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial &&
        ae.aggregateFunction.prettyName.contains("hll_sketch_agg")))
    assert(partialSketch, s"hll_sketch_agg must have a Partial (map-side) phase:\n$p")
  }

  test("d12: no join ships raw window text — only 64-bit hashes cross the frequency join") {
    val p = sparkPlan("d12_substring_dup_mass")
    val joined = collectAll(p) {
      case j: BroadcastHashJoinExec => j.output.map(_.name)
      case j: SortMergeJoinExec => j.output.map(_.name)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.output.map(_.name)
    }.flatten
    assert(joined.nonEmpty, "expected the window-frequency join in the plan")
    assert(!joined.exists(n => n == "win" || n == "text" || n == "w"),
      s"raw window text must not ride the join, got columns: ${joined.distinct.mkString(",")}")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "substring dup mass must never plan a quadratic join")
  }

  test("e11: centroids broadcast; the only non-broadcast join keys on the cell — no cartesian") {
    val p = sparkPlan("e11_semdedup")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "semdedup must never plan a cartesian product")
    // the centroid table must reach the assignment as a broadcast
    // (BroadcastNestedLoop is acceptable THERE: it's a 10-row dimension
    // cross — the corpus side streams); the pair generation must be a
    // cell-keyed equi-join, not a broadcast of the corpus
    val equiJoins = collectAll(p) {
      case j: SortMergeJoinExec => j.leftKeys.map(_.sql)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.map(_.sql)
      case j: BroadcastHashJoinExec => j.leftKeys.map(_.sql)
    }
    assert(equiJoins.exists(_.exists(_.contains("cell"))),
      s"within-cell pairing must be a cell-keyed equi-join, got keys: $equiJoins")
  }

  test("k03: hot route is a broadcast hash join; the plan unions two routes") {
    val p = sparkPlan("k03_hot_key_isolation")
    // hot slice of the build side + the semi/anti splits all broadcast —
    // at least one BroadcastHashJoin must carry the p_partkey equi-key
    val bhj = collectAll(p) { case j: BroadcastHashJoinExec => j.leftKeys.map(_.sql) }
    assert(bhj.exists(_.exists(_.contains("p_partkey"))),
      s"hot route must broadcast on the join key, got: $bhj")
    assert(p.toString.contains("Union"), "hot and cold routes must union")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "no cartesian anywhere in the routed join")
  }

  test("e12: both retrieval channels lower to TakeOrderedAndProject, never a full sort") {
    val p = sparkPlan("e12_hybrid_rrf")
    val topk = collectAll(p) { case t: TakeOrderedAndProjectExec => t }
    // lexical top-50, vector top-50, fused top-10
    assert(topk.size >= 3, s"expected 3 TakeOrdered channels, got ${topk.size}:\n$p")
  }

  test("g04: triangle credits come from equi-joins only (no quadratic operator)") {
    val p = sparkPlan("g04_edge_jaccard")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, "edge jaccard must never plan a nested-loop or cartesian join")
  }

  /** The designed broadcast-crosses (a |cells|-row centroid table or a
    * 1-row total against the corpus) plan as BroadcastNestedLoopJoin —
    * bounded by construction, blessed since round 1. What must NEVER
    * appear is a CartesianProduct (two unbounded sides) — and the real
    * candidate machinery must stay equi-keyed (BroadcastHashJoin /
    * shuffle joins on blocking columns).
    */
  private def noCartesian(p: SparkPlan, what: String): Unit =
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"$what must never plan an unbounded cartesian join")

  test("e25: the composed serve keeps candidates equi-keyed; no cartesian anywhere") {
    val p = sparkPlan("e25_ivf_sq_serve")
    // probes×assigned on cell, q codes on qid, rerank embeddings on
    // nid/qid — the candidate path is equi-broadcast machinery (the
    // only NLJs are ivfCranked's bounded |cells|-row centroid crosses)
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.size >= 2,
      s"probe map and query codes should broadcast:\n$p")
    noCartesian(p, "the serving path")
  }

  test("e11: the derived multi-probe pair join stays keyed on (cell, sub)") {
    val p = sparkPlan("e11_semdedup")
    noCartesian(p, "sem pair generation")
    // the pair join itself is an equi join on the blocking columns; at
    // this b = 0 fixture Catalyst constant-folds the sub key (lit(0) on
    // both sides), so the planned key set is (cell) alone — the
    // invariant visible here is "equi join exists, quadratic operator
    // doesn't"; the b > 0 key shape is exercised by the 8× fixture gate
    val equi = collectAll(p) {
      case j: SortMergeJoinExec => j.leftKeys.size
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.size
    }
    assert(equi.exists(_ >= 1), s"expected a cell-keyed equi pair join:\n$p")
  }

  test("d18: the sweep is filters over the banded pair frame (no quadratic operator)") {
    val p = sparkPlan("d18_jaccard_sweep")
    noCartesian(p, "the threshold sweep")
  }

  test("p15: the dataset card never plans a cartesian; dup flag is an equi join") {
    val p = sparkPlan("p15_dataset_card")
    noCartesian(p, "the dataset card")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "no nested-loop join in the card path")
  }

  test("z07: one scan grades all three layouts — lineitem is read at most twice") {
    // the advisor's scale claim: the stack generator fans ONE pass of the
    // rows into the three layouts (plus the separate exact ground-truth
    // pass); a per-layout rewrite would show >= 4 lineitem scans. The
    // 1-row bounds frame is materialized, so its agg doesn't re-scan.
    val p = sparkPlan("z07_layout_advisor")
    val liScans = collectAll(p) {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("lineitem")) => s
    }
    assert(liScans.size <= 2, s"expected <= 2 lineitem scans, got ${liScans.size}")
    assert(collectAll(p) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, "expected the stack/sequence generators")
  }
}
