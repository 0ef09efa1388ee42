package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the part co-purchase graph (parts that appear in
  * the same order are neighbors) — the family d07's connected components
  * opened, completed with the other two classics: triangle counting and a
  * PageRank iteration.
  *
  * Both are written in their at-scale formulations:
  * - g01 orients every edge by (degree, id) before wedging, so wedge
  *   generation is Σ out-deg² with out-degrees bounded by √(2·|E|) — the
  *   standard trick that keeps a power-law hub from exploding the join
  *   (a raw wedge join on an unoriented graph is Σ deg², which one hub
  *   makes quadratic).
  * - g02 is one message-passing round as two hash joins + one hash agg,
  *   with integer contributions (floor(SCALE / deg)) so the per-vertex
  *   sum is order-independent — float PageRank sums would be
  *   shuffle-order-dependent and unverifiable against any oracle.
  *
  * The reference has no graph surface; these extend the north-star
  * analytic catalog (SURVEY.md §2.8) the way d07 does.
  */
object Graph {

  /** g02: fixed-point scale for integer rank contributions. */
  val RankScale = 1000000000000L // 1e12

  /** g03: BFS round cap — co-purchase graphs are small-world (diameter a
    * handful); hitting the cap with a non-empty frontier THROWS rather
    * than silently emitting truncated levels (the MaxCcRounds
    * discipline).
    */
  val MaxBfsRounds = 30

  /** g03: directory count for the range-bucketed adjacency layout (see
    * bfsLevels). A constant, not a function of |V|: what it bounds is the
    * per-round driver traffic (≤ this many bucket ids collected to plan
    * the pruned scan) and the file-listing overhead; within a bucket the
    * scan is columnar and parallel, so more buckets past ~the executor
    * count buys pruning granularity but nothing else.
    */
  val BfsAdjBuckets = 64

  /** Undirected co-purchase pairs (u < v), WITH multiplicity — one row
    * per order that pairs the two parts. Per-order part sets are small
    * (TPC-H ~4 lineitems/order), so the self-join on l_orderkey is
    * bounded per key — never an n² blowup. Consumers that need the
    * deduplicated edge SET take partEdges; a consumer whose next step is
    * a per-vertex set aggregation (g03's adjacency build) takes this raw
    * form and saves the full dedup shuffle.
    */
  private[operators] def partPairs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    li.select(col("ok"), col("pk").as("u"))
      .join(li.select(col("ok"), col("pk").as("v")), "ok")
      .filter(col("u") < col("v"))
      .select("u", "v")
  }

  /** Deduplicated undirected co-purchase edges (u < v) — a per-JVM SHARED
    * FIXTURE (Materialize.fixture): the first consumer pays the lineitem
    * self-join + distinct once and stores the edge set; every later
    * consumer — across queries in the same process — reads the stored
    * copy as a flat parquet scan. Ten catalog queries derive exactly this
    * table; per-query re-derivation was the g-family's measured ~5–10 s
    * fixed cost at sf0.1 (the round-11 bench-median regression). The scan
    * form (not a persist) survives Bench's inter-query cache fence and
    * frees executor memory for the rounds themselves. Each kernel stays
    * correct standalone: a solo query builds the fixture itself.
    */
  private[operators] def partEdges(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "edges")(partPairs(s, dir).distinct())

  /** Per-JVM shared-fixture accessor for the co-purchase family (see
    * partEdges). Keyed on (data dir, fixture name): the key determines
    * the content, so any session in the JVM may share the copy.
    */
  private def fx(s: SparkSession, dir: String, name: String)
                (build: => DataFrame): DataFrame =
    graft.Materialize.fixture(s, s"gx-$name|$dir")(build)

  /** Shared per-vertex degree table (x, deg) over partEdges. */
  private[operators] def degFixture(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "deg")(degrees(partEdges(s, dir)))

  /** Shared degree-annotated DIRECTED message edges (src, dst, deg) —
    * each undirected edge both ways, deg = out-degree of src. The input
    * every Pregel-shaped round in the family joins its state against
    * (g02/g02b PageRank, g06 assortativity, g08 CC, g11 LPA, g14 PPR,
    * g15 sampling). Stored once: 2|E| rows × 3 longs.
    */
  private[operators] def msgsFixture(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "msgs") {
      val e = partEdges(s, dir)
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .join(degFixture(s, dir).select(col("x").as("src"), col("deg")), "src")
        .select("src", "dst", "deg")
    }

  /** Shared degree-annotated undirected edges (u, v, du, dv) — the
    * triangle kernel's input (orientation, adjacency, per-edge degree
    * columns all derive from it). See degAnnotatedEdges for why the
    * annotation must be computed once, never per-alias.
    */
  private[operators] def degEdgesFixture(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "wd") {
      val deg = degFixture(s, dir)
      partEdges(s, dir)
        .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
        .select("u", "v", "du", "dv")
    }

  /** Shared oriented triangle table (a, b, c) — one row per triangle,
    * found exactly once on its degree-lowest edge (orientedTrianglesFrom).
    * g01 counts it, g04 turns it into edge credits, g07 into vertex
    * credits, g12 decrements supports against it — four queries, one
    * enumeration (the measured ~4–5 s fixed cost of each, paid once).
    */
  private[operators] def trisFixture(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "tris")(orientedTrianglesFrom(degEdgesFixture(s, dir)))

  /** Shared per-edge triangle support (u, v, sup) — trisFixture's three
    * edge credits per triangle aggregated once and left-joined back onto
    * the edge set (triangle-free edges carry 0). g04's common-neighbor
    * counts and g12's round-1 supports are BOTH exactly this table; the
    * 3|T|-row explode + aggregation is the single most expensive derived
    * step in the family, so it too is paid once per JVM.
    */
  private[operators] def supFixture(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "sup") {
      val credits = trisFixture(s, dir)
        .select(explode(array(
          struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
          struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
          struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("sup"))
      partEdges(s, dir).join(credits, Seq("u", "v"), "left")
        .select(col("u"), col("v"), coalesce(col("sup"), lit(0L)).as("sup"))
    }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))

  /** g01 core over undirected (u < v) edges — extracted so closed-form
    * graphs (K4 = 4 triangles, C4 = 0, two sharing an edge = 2) pin the
    * count exactly and a brute-force triple enumeration cross-checks it.
    *
    * Formulation: adjacency-array intersection, NOT a wedge join. The
    * 2-join version materializes Σ out-deg² wedge rows through a shuffle
    * (measured: 400 M rows and 25× super-linear wall-clock at the 10×
    * probe — it spills long before a cluster would need to shuffle at
    * all). Here each oriented edge (a, b) intersects N⁺(a) with N⁺(b)
    * IN-ROW: the shuffles carry only the |E| edge rows and |V| adjacency
    * arrays, and the O(Σ min-deg) intersection work happens inside a
    * per-row expression. Degree orientation still bounds every array at
    * O(√E), so no row is ever pathological.
    */
  /** Degree-annotated edge frame (u, v, du, dv) — MATERIALIZED once.
    *
    * Every triangle-kernel consumer needs per-endpoint degrees in
    * several places (orientation, the final per-edge join, the wedge
    * census), and each differently-aliased `degrees(e)` join is a
    * canonically-distinct subplan Catalyst will NOT exchange-reuse: the
    * pre-fix g04 plan re-ran the |2E|-row degree aggregation 6–8 times
    * per action (measured: eight 64-task union+agg passes, ~30 s of task
    * time inside one 17 s query). Annotating once and deriving
    * orientation, adjacency, and the final join all from this cached
    * frame makes the degree agg a once-per-query cost. Size is O(|E|)
    * rows × 4 longs — the same order as the edge set itself, so anywhere
    * partEdges' cache fits, this does too.
    */
  private[operators] def degAnnotatedEdges(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    graft.Materialize(e
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v"))
  }

  /** Degree-orientation of a degAnnotatedEdges frame: (a, b) with a the
    * (deg, id)-lower endpoint — a narrow select over the cached frame,
    * so each of its several consumers re-reads cache, never re-joins.
    */
  private[operators] def orientedFrom(wd: DataFrame): DataFrame = {
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    wd.select(
      when(lower, col("u")).otherwise(col("v")).as("a"),
      when(lower, col("v")).otherwise(col("u")).as("b"))
  }

  /** Oriented out-adjacency arrays, MATERIALIZED: both probe sides of
    * the triangle join consume this under different aliases, and an
    * un-cached plan runs the collect_list shuffle agg twice (the same
    * no-exchange-reuse trap as the degree agg). O(|V|) rows carrying
    * O(√E)-bounded arrays — Σ lengths = |E|, one long per edge.
    * sort_array: pins the partition-dependent collect_list order AND
    * establishes the sorted-input contract of sorted_intersect_count.
    */
  private[operators] def orientedAdjacency(oriented: DataFrame): DataFrame =
    graft.Materialize(oriented.groupBy(col("a").as("x"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs")))

  private[operators] def triangleStats(e: DataFrame): DataFrame = {
    val wd = degAnnotatedEdges(e)
    triangleStatsFrom(wd, orientedTrianglesFrom(wd))
  }

  /** g01 over pre-built (possibly fixture-shared) frames: wd = the
    * degree-annotated edges, tris = the oriented triangle rows. The
    * triangle count is COUNT(*) over tris — identical to the former
    * inline sorted_intersect_count sum (each exploded row is one unit of
    * that sum; edges whose higher endpoint has no out-adjacency
    * contributed 0 there and contribute no rows here).
    */
  private[operators] def triangleStatsFrom(wd: DataFrame, tris: DataFrame): DataFrame = {
    val tri = tris.agg(count(lit(1)).as("n_triangles"))
    // vertex/wedge census from the annotated frame: each vertex's
    // (x, deg) appears once per incident edge — distinct first, then the
    // same integer wedge sum as before
    val vdeg = wd.select(col("u").as("x"), col("du").as("deg"))
      .unionAll(wd.select(col("v").as("x"), col("dv").as("deg"))).distinct()
    val stats = wd.agg(count(lit(1)).as("n_edges"))
      .crossJoin(vdeg.agg(count(lit(1)).as("n_vertices"),
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges")))
    stats.crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, 0.0)
          .otherwise((col("n_triangles") * 3).cast("double") / col("n_wedges").cast("double"))
          .as("clustering_coeff"))
  }

  /** g02 core over undirected (u < v) edges: one integer message round. */
  private[operators] def pagerankStep(e: DataFrame, topK: Int): DataFrame = {
    val deg = degrees(e)
    pagerankStepFromMsgs(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .join(deg.select(col("x").as("src"), col("deg")), "src"), topK)
  }

  /** g02 over the pre-built (src, dst, deg) message edges (msgsFixture). */
  private[operators] def pagerankStepFromMsgs(msgs: DataFrame, topK: Int): DataFrame =
    msgs.select(col("dst"), expr(s"${RankScale}L div deg").as("contrib"))
      .groupBy("dst")
      .agg(sum("contrib").as("rank_num"), count(lit(1)).as("in_deg"))
      .orderBy(col("rank_num").desc, col("dst").asc)
      .limit(topK)
      .select(col("dst").as("part_id"), col("in_deg"), col("rank_num"))

  /** g02b: fixed round count for the PageRank power iteration — both
    * engines unroll exactly this many layers (the g05 peel discipline),
    * so the profiles align row-for-row with no convergence-test
    * divergence to reconcile.
    */
  val PageRankRounds = 8
  /** g02b: damping d = 0.85 as an integer ratio — rank_{t+1}(v) =
    * (scale·15)∕100 + (85·Σ contrib)∕100 in floor division, so the
    * iteration compounds deterministically and bit-identically across
    * engines (a float damping would drift at the ulp level per round).
    */
  val DampNum = 85L
  val DampDen = 100L

  /** g02b core: K damped PageRank rounds from the uniform state, with a
    * CONVERGENCE PROFILE as the output — one row per round carrying the
    * total rank movement Σ|r_t − r_{t−1}|, the rank extremes, and the
    * total mass (floor losses drain it slightly each round; the profile
    * shows that too). The iteration is g02's message round compounded:
    * the degree-annotated message edges are built ONCE (bfsLevels'
    * one-time-adjacency discipline) and each round shuffles only the
    * |V|-row rank table through one join + one hash agg — per-round cost
    * is flat in rounds and linear in |E|. Driver traffic is 4 audit
    * scalars per round (the d07/g05 discipline); each round's rank frame
    * is materialized and the previous round's unpersisted, so lineage
    * stays one layer deep.
    */
  private[operators] def pagerankProfile(e: DataFrame,
                                         rounds: Int = PageRankRounds): DataFrame = {
    val deg = degrees(e)
    // the degree-annotated message edges are built ONCE and consumed
    // once per round — scratch PARQUET, not cache: at 100× the cached
    // 2|E|-row frame and each round's shuffle fight over the same
    // unified memory (measured: round ~6 evicts the cache mid-task and
    // the executor dies UNABLE_TO_ACQUIRE_MEMORY), while a columnar
    // scan per round costs disk IO the OS page cache mostly absorbs.
    // (The catalog entry passes the shared msgsFixture instead — same
    // content, built once per JVM.)
    val msgs = e.sparkSession.read.parquet(graft.Materialize.toStoragePath(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .join(deg.select(col("x").as("src"), col("deg")), "src"), "pr_msgs"))
    pagerankProfileFromParts(msgs, deg, rounds)
  }

  /** g02b over pre-stored message edges (a flat scan — msgsFixture or the
    * legacy pr_msgs scratch) and the degree table.
    *
    * NOTE: an AQE-off child session (Materialize.loopSession) was
    * measured here and does NOT help (7.0-7.1 s → 7.8-8.3 s at sf0.1):
    * unlike the CC loop, g02b's per-round wall is the scratch-write and
    * audit jobs themselves, and AQE's small-shuffle coalescing earns
    * its job-bookkeeping back. Kept on the owner session deliberately.
    */
  private[operators] def pagerankProfileFromParts(msgs: DataFrame, deg: DataFrame,
                                                  rounds: Int = PageRankRounds): DataFrame = {
    val spark2 = msgs.sparkSession
    import spark2.implicits._
    // Each round's rank table goes to SCRATCH STORAGE, not cache: the
    // carried frame is referenced twice per round (message join + the
    // prev-rank self rows below), and persist does NOT truncate logical
    // plans — cache substitution happens after analysis, so a cached
    // carry would double the analyzed plan every round (2^K copies by
    // round K; measured as an analyzer heap blow-up at K = 8). A
    // re-read parquet scratch table is a constant-size scan plan, the
    // same iterative-state discipline as bfsLevels/toStorage, and on a
    // real cluster (scratchDir on HDFS/S3) it survives executor loss.
    var rank = spark2.read.parquet(graft.Materialize.toStoragePath(
      deg.select(col("x"), lit(RankScale).as("rank")), "pr_r0"))
    val base = RankScale * (DampDen - DampNum) / DampDen
    val profile = (1 to rounds).map { r =>
      // the previous rank rides the same shuffle as the contributions
        // (a zero-contribution self row per vertex, max-folded back out
        // by the agg — every vertex has deg ≥ 1 on an undirected edge
        // set, so the union covers all of them). Per round: one |E|-row
        // job that computes-and-stores the rank table, plus a
        // metadata-sized audit scan of the |V|-row scratch file. The
        // first cut ran 2 shuffling jobs per round (Materialize count +
        // an audit join), which at small SF was pure scheduler overhead
        // (23.6 s at sf0.001 for ~60 k edges).
        val nextPath = graft.Materialize.toStoragePath(msgs
          .join(rank.select(col("x").as("src"), col("rank").as("srank")), "src")
          .select(col("dst"), expr("srank div deg").as("c"), lit(0L).as("pr"))
          .unionAll(rank.select(col("x").as("dst"), lit(0L).as("c"), col("rank").as("pr")))
          .groupBy(col("dst").as("x"))
          .agg(sum("c").as("m"), max("pr").as("prev_rank"))
          .select(col("x"),
            (lit(base) + expr(s"m * $DampNum div $DampDen")).as("rank"),
            col("prev_rank")), s"pr_r$r")
        val next = spark2.read.parquet(nextPath)
        val row = next
          .agg(sum(abs(col("rank") - col("prev_rank"))).as("move"),
            max("rank").as("rmax"), min("rank").as("rmin"), sum("rank").as("mass"))
          .collect()(0)
        rank = next.select(col("x"), col("rank"))
        (r.toLong, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      }
    val profDf = profile.toDF("round", "total_move", "max_rank", "min_rank", "rank_mass")
    profDf.orderBy("round")
  }

  /** g14: fixed personalized-PageRank round count — both engines unroll
    * exactly this many layers (the g02b rule), and the seed set is the
    * PprSeedK highest-degree vertices (deg DESC, id ASC — deterministic).
    */
  val PprRounds = 4
  val PprSeedK = 4

  /** g14 core: personalized PageRank over undirected (u < v) edges — the
    * "what's relevant NEAR these seeds" ranking behind related-item
    * panels and seed-expanded curation (pick a few known-good documents,
    * walk the similarity graph, harvest the neighborhood). Identical
    * integer arithmetic to g02b's damped rounds with ONE change: the
    * (1−d) restart mass re-injects at the SEEDS each round instead of
    * uniformly, so rank decays with graph distance from the seed set.
    * r₀ = RankScale at seeds / 0 elsewhere; each round
    * rank(v) = [v∈S]·base + (85·Σ_{u→v} floor(rank(u)∕deg(u)))∕100 in
    * floor division — bit-identical across engines, no float drift.
    *
    * Iterative-state discipline is g02b's verbatim: degree-annotated
    * message edges built ONCE into scratch parquet, each round's rank
    * table scratch-carried (plan stays one layer deep; survives executor
    * loss on a real cluster). Per round: one |E|-row join + one hash agg
    * — per-round cost flat in rounds, linear in |E|. Every vertex has
    * deg ≥ 1 on an undirected edge set, so every vertex receives ≥ 1
    * message and the round's agg covers all of V (zero-rank vertices
    * included — their contributions are 0, their rows persist). Output
    * is the top-20 final ranks: the seed-neighborhood harvest list.
    */
  private[operators] def pprRanks(e: DataFrame,
                                  rounds: Int = PprRounds): DataFrame = {
    val spark = e.sparkSession
    val deg = degrees(e)
    val msgs = spark.read.parquet(graft.Materialize.toStoragePath(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .join(deg.select(col("x").as("src"), col("deg")), "src"), "ppr_msgs"))
    pprRanksFromParts(msgs, deg, rounds)
  }

  /** g14 over pre-stored message edges (msgsFixture / ppr_msgs scratch)
    * and the degree table.
    */
  private[operators] def pprRanksFromParts(msgs: DataFrame, deg: DataFrame,
                                           rounds: Int = PprRounds): DataFrame = {
    val spark = msgs.sparkSession
    val seedBase = RankScale * (DampDen - DampNum) / DampDen
    // |S| rows — broadcast at every use
    val seeds = graft.Materialize(
      deg.orderBy(col("deg").desc, col("x").asc).limit(PprSeedK)
        .select(col("x"), lit(seedBase).as("sb")))
    var rank = spark.read.parquet(graft.Materialize.toStoragePath(
      deg.join(broadcast(seeds), Seq("x"), "left")
        .select(col("x"),
          when(col("sb").isNotNull, lit(RankScale)).otherwise(lit(0L)).as("rank")),
      "ppr_r0"))
    (1 to rounds).foreach { r =>
      rank = spark.read.parquet(graft.Materialize.toStoragePath(
        msgs.join(rank.select(col("x").as("src"), col("rank").as("srank")), "src")
          .select(col("dst"), expr("srank div deg").as("c"))
          .groupBy(col("dst").as("x"))
          .agg(sum("c").as("m"))
          .join(broadcast(seeds), Seq("x"), "left")
          .select(col("x"),
            (coalesce(col("sb"), lit(0L)) + expr(s"m * $DampNum div $DampDen"))
              .as("rank")), s"ppr_r$r"))
    }
    rank.join(broadcast(seeds), Seq("x"), "left")
      .select(col("x").as("part_id"), col("rank"), col("sb").isNotNull.as("is_seed"))
      .orderBy(col("rank").desc, col("part_id").asc)
      .limit(20)
  }

  /** g15: per-vertex neighbor cap (the GraphSAGE-style fan-out bound). */
  val SampleK = 8

  /** g15 core: degree-capped neighbor sampling over undirected (u < v)
    * edges — the preprocessing every GNN training pipeline and every
    * hub-defensive graph join runs: keep at most SampleK neighbors per
    * vertex, chosen by HASH RANK (xxhash64 of the combined endpoint key),
    * so the "uniform" sample is deterministic, partition-invariant, and
    * identical on task retry — rand() here would break all three (the
    * k01 salting lesson). The combined key src·100000007 + dst stays
    * far inside int64 for any realistic id space (ANSI Spark and DuckDB
    * both fail loud on real overflow rather than wrapping differently).
    * INJECTIVITY BOUND: the combination is collision-free only while
    * dst < 100000007 (~1e8); above that, distinct edges can share a key
    * and the hash-rank sample degrades in UNIFORMITY only — both engines
    * still compute the identical (still deterministic) selection, so
    * correctness is unaffected. An id space past 1e8 should re-derive
    * the key as a two-word hash chain (DuckHash.xxhash64LongCtes
    * composed per word) on both sides.
    * Output is the per-degree-bucket census of what the cap does —
    * vertices, total vs kept edges, drop fraction — plus an integer
    * checksum over the KEPT edges' hash ranks, which pins the selection
    * itself (not just its size) under the oracle. One shuffle on src;
    * the window sort is per-vertex; everything after is ≤ 64 bucket rows.
    */
  private[operators] def neighborSample(e: DataFrame): DataFrame =
    neighborSampleFromMsgs(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst"))))

  /** g15 over pre-built directed neighbor rows (msgsFixture). */
  private[operators] def neighborSampleFromMsgs(msgs: DataFrame): DataFrame = {
    val nb = msgs.select(col("src"), col("dst"))
      .withColumn("hv", expr("xxhash64(src * 100000007L + dst)"))
    val wSrc = Window.partitionBy("src")
    val wOrd = Window.partitionBy("src").orderBy(col("hv").asc, col("dst").asc)
    nb.withColumn("rn", row_number().over(wOrd))
      .withColumn("deg", count(lit(1)).over(wSrc))
      .withColumn("kept", col("rn") <= SampleK)
      .groupBy(length(bin(col("deg"))).cast("long").as("bucket"))
      .agg(countDistinct("src").as("n_vertices"),
        count(lit(1)).as("edges_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("edges_kept"),
        sum(when(col("kept"), pmod(col("hv"), lit(1000000007L))).otherwise(0L))
          .as("keep_checksum"))
      .withColumn("drop_fraction",
        lit(1.0) - col("edges_kept").cast("double") / col("edges_total").cast("double"))
      .orderBy("bucket")
  }

  /** g06 core over undirected (u < v) edges — integer moment sums over
    * the directed endpoint list plus the closed-form Pearson ratio (see
    * the query scaladoc for why symmetry eliminates the square root).
    */
  private[operators] def degreeAssortativity(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    degreeAssortativityFromDirected(
      e.select(col("u").as("i"), col("v").as("j"))
        .unionAll(e.select(col("v").as("i"), col("u").as("j")))
        .join(deg.select(col("x").as("i"), col("deg").as("dx")), "i")
        .join(deg.select(col("x").as("j"), col("deg").as("dy")), "j"))
  }

  /** g06 from the shared fixtures: msgsFixture already carries the
    * source-endpoint degree; one join against the degree table supplies
    * the destination's. Identical directed endpoint list.
    */
  private[operators] def degreeAssortativityFromParts(msgs: DataFrame,
                                                      deg: DataFrame): DataFrame =
    degreeAssortativityFromDirected(
      msgs.select(col("src").as("i"), col("dst").as("j"), col("deg").as("dx"))
        .join(deg.select(col("x").as("j"), col("deg").as("dy")), "j"))

  private def degreeAssortativityFromDirected(directed: DataFrame): DataFrame = {
    // M·Σxy and (Σx)² overflow int64 at the 10× graph (M ~ 10⁶·Σxy ~
    // 10¹²), so the ratio terms are computed in DECIMAL(38,0) — exact,
    // the same integers DuckDB's HUGEINT carries — and each side casts
    // to DOUBLE before the one division: both engines round the same
    // exact integer to the same double. The published moment sums
    // themselves fit BIGINT at any realistic scale.
    val dec = "decimal(38,0)"
    def d(c: org.apache.spark.sql.Column) = c.cast(dec)
    directed
      .agg(count(lit(1)).as("m_directed"),
        sum("dx").as("sum_x"),
        sum(col("dx") * col("dy")).as("sum_xy"),
        sum(col("dx") * col("dx")).as("sum_x2"))
      .select(col("m_directed"), col("sum_x"), col("sum_xy"), col("sum_x2"),
        // a REGULAR graph has zero degree variance — r is undefined
        // (0/0), reported as NULL in both engines (ANSI throws on the
        // bare division)
        when(d(col("m_directed")) * d(col("sum_x2")) === d(col("sum_x")) * d(col("sum_x")),
          lit(null).cast("double"))
          .otherwise(
            (d(col("m_directed")) * d(col("sum_xy")) - d(col("sum_x")) * d(col("sum_x"))).cast("double") /
              (d(col("m_directed")) * d(col("sum_x2")) - d(col("sum_x")) * d(col("sum_x"))).cast("double"))
          .as("assortativity"))
  }

  /** g08: fixed label-propagation round count — both engines unroll
    * exactly this many layers (the g02b/g05 discipline), so convergence
    * needs no cross-engine agreement: converged rounds just show zero
    * movement, and the profile says WHEN that happened.
    */
  val CcRounds = 12

  /** g08 core over undirected (u < v) edges — the CONNECTED-COMPONENTS
    * CONVERGENCE PROFILE by min-label propagation: every vertex starts
    * labeled with its own id; each round it takes the min of its own and
    * its neighbors' labels; the per-round row reports how many labels
    * moved, the distinct-label count (an upper bound on components that
    * becomes exact at convergence), and the label-mass checksum. The
    * connectivity audit of graph curation — "is the co-purchase graph one
    * blob or many islands, and how fast does it mix". Iterative-state
    * discipline is g02b's verbatim: message edges built once into scratch
    * parquet, each round's label table materialized to scratch (the
    * carried frame is referenced twice per round), the previous label
    * rides the contribution shuffle as flagged self rows, driver traffic
    * = 3 audit scalars per round; once a round moves nothing the
    * remaining rounds are synthesized job-free (the labels are a fixed
    * point, so their stats are the converged round's verbatim — g05's
    * converged-round rule).
    */
  private[graft] def ccProfile(e: DataFrame,
                                   rounds: Int = CcRounds): DataFrame = {
    val spark = e.sparkSession
    val msgs = spark.read.parquet(graft.Materialize.toStoragePath(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst"))), "cc_msgs"))
    val verts = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x"))).distinct()
    ccProfileFromParts(msgs, verts, rounds)
  }

  /** g08 over pre-stored directed message edges (any frame carrying
    * (src, dst) — msgsFixture works verbatim) and the vertex set.
    */
  private[graft] def ccProfileFromParts(msgs: DataFrame, verts: DataFrame,
                                        rounds: Int = CcRounds): DataFrame = {
    val spark = msgs.sparkSession
    import spark.implicits._
    var lab = spark.read.parquet(graft.Materialize.toStoragePath(
      verts.select(col("x"), col("x").as("lab")), "cc_l0"))
    var converged = false
    var lastRow: (Long, Long, Long) = null
    val prof = (1 to rounds).map { r =>
      if (converged) (r.toLong, 0L, lastRow._2, lastRow._3)
      else {
        val nextPath = graft.Materialize.toStoragePath(msgs
          .join(lab.select(col("x").as("src"), col("lab").as("slab")), "src")
          .select(col("dst"), col("slab"), lit(0).as("own"))
          .unionAll(lab.select(col("x").as("dst"), col("lab").as("slab"), lit(1).as("own")))
          .groupBy(col("dst").as("x"))
          .agg(min("slab").as("lab"),
            max(when(col("own") === 1, col("slab"))).as("prev_lab")), s"cc_l$r")
        val next = spark.read.parquet(nextPath)
        val row = next.agg(
          sum(when(col("lab") =!= col("prev_lab"), 1L).otherwise(0L)).as("n_changed"),
          countDistinct("lab").as("n_labels"),
          sum("lab").as("label_sum")).collect()(0)
        val t = (row.getLong(0), row.getLong(1), row.getLong(2))
        lab = next.select(col("x"), col("lab"))
        if (t._1 == 0L) converged = true
        lastRow = t
        (r.toLong, t._1, t._2, t._3)
      }
    }
    prof.toDF("round", "n_changed", "n_labels", "label_sum").orderBy("round")
  }

  /** g03 core: single-source BFS by iterative frontier expansion — the
    * third canonical Pregel shape after label propagation (d07) and one
    * message round (g02). Root = the max-degree vertex (tie-break min
    * id — deterministic). Each round: frontier ⋈ edges → dedup → anti-join
    * visited; the shuffles carry only the frontier fan-out and the visited
    * id set, never the whole graph per round, and only a 1-row emptiness
    * probe reaches the driver per round. Rounds = eccentricity of the
    * root (small-world graphs: a handful at any scale).
    */
  /** g03: vertex count at which bfsLevels switches the adjacency from a
    * memory cache to the range-bucketed storage layout. The bucketed
    * layout's pruning is the 100×-probe win (per-round IO ∝ frontier
    * coverage, 593 → 31.5 s), but it pays a fixed write + per-round
    * cold-read cost that a cache-resident adjacency doesn't — measured
    * ~+5 s at sf0.1 (20 k vertices), where the whole adjacency fits in
    * memory and pruning buys nothing. Below the threshold the cached
    * frame wins by construction; above it, cache residency is no longer
    * guaranteed and pruned reads win. Same decision rule a table
    * service applies to any index: build it when the data outgrows the
    * cache, not before.
    */
  val BfsStorageMinVertices = 1000000L

  private[operators] def bfsLevels(e: DataFrame, maxRounds: Int = MaxBfsRounds,
                                   storageMinVertices: Long = BfsStorageMinVertices): DataFrame = {
    val spark = e.sparkSession
    // adjacency lists, built ONCE: the per-round expansion joins the
    // frontier against |V| adjacency rows instead of re-shuffling the
    // full 2|E| edge list every round — the difference between per-round
    // shuffle ∝ frontier fan-out and per-round shuffle ∝ |E| at cluster
    // scale. collect_set also absorbs input multiplicity, so the input
    // may be the RAW pair stream (partPairs) — no edge-dedup shuffle.
    val adjBuild = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
      .groupBy("src").agg(collect_set(col("dst")).as("nbrs"))
      .persist()
    // each round persists ONLY its level frame; `visited` stays a lazy
    // union over those caches (≤ |V| cached rows total, re-cached never)
    var levels = List.empty[DataFrame]
    try {
      // 2 driver rows, both over the just-cached adjacency: the id range
      // (sizes the range-bucket layout below) and the root choice (same
      // 1-scalar discipline as d07's convergence count). The first job
      // also materializes the cache.
      val statsRow = adjBuild.agg(min(col("src")).as("lo"), max(col("src")).as("hi"),
        count(lit(1)).as("nv")).collect()(0)
      require(!statsRow.isNullAt(0), "bfsLevels: empty edge input — no root to pick")
      val (lo, hi, nV) = (statsRow.getLong(0), statsRow.getLong(1), statsRow.getLong(2))
      val root = adjBuild
        .orderBy(size(col("nbrs")).desc, col("src").asc)
        .limit(1).select("src").collect()(0).getLong(0)
      // the at-scale lever (SCALING.md's 100× reading: pre-bucketing,
      // every round scanned the FULL adjacency — rounds × |E|): past the
      // size threshold, write the adjacency ONCE as a range-bucketed
      // table (bkt = (src−lo) ∕ w, ≤ BfsAdjBuckets directories), and
      // each round scan ONLY the buckets the frontier's ids fall in.
      // Range (not hash) bucketing is deliberate: real vertex ids have
      // locality (a crawl segment, a tenant, one component of a
      // partitioned graph), so a frontier confined to a region touches
      // few ranges — a hash layout would smear any frontier across every
      // bucket and prune nothing. Per-round IO ∝ frontier's bucket
      // coverage, never |E|. Below the threshold the cached adjacency
      // stays resident and pruning would only add cold reads (see
      // BfsStorageMinVertices).
      val useStorage = nV >= storageMinVertices
      val w = math.max(1L, (hi - lo) / BfsAdjBuckets + 1L)
      // integer DIV (the Layout.overlapDepth idiom), not double division:
      // long/long `/` on Columns is IEEE double then int-cast, which at
      // extreme id ranges can round up into a phantom 64th bucket
      def bktOf(name: String) = expr(s"CAST(($name - ${lo}L) DIV ${w}L AS INT)")
      val adj: DataFrame =
        if (!useStorage) adjBuild
        else {
          val adjPath = graft.Materialize.toStoragePathPartitioned(
            adjBuild.withColumn("bkt", bktOf("src")), "bfs_adj", "bkt")
          adjBuild.unpersist()
          spark.read.parquet(adjPath)
        }
      var frontier = spark.range(1)
        .select(lit(root).as("v"), lit(0L).as("lvl")).persist()
      levels = frontier :: levels
      var visited = frontier
      var lvl = 0L
      var exhausted = false
      while (!exhausted && lvl < maxRounds) {
        // ≤ BfsAdjBuckets scalars to the driver: the bucket ids this
        // frontier touches — bounded by the bucket-count CONSTANT, never
        // by frontier size. The isin over literal partition values is
        // what turns into planning-time directory pruning on the scan.
        val adjRound =
          if (!useStorage) adj
          else {
            val bkts = frontier.select(bktOf("v").as("bkt"))
              .distinct().collect().map(_.getInt(0)).toSeq
            adj.where(col("bkt").isin(bkts: _*))
          }
        // no broadcast hint: a small-world frontier can be most of |V| by
        // level 2, so the join must be allowed to stay a shuffle join —
        // AQE broadcasts the early (tiny) frontiers on its own. distinct
        // runs BEFORE the anti-join: its map-side partial dedup collapses
        // the fan-out to ≤ |V| rows per task before anything shuffles.
        val next = adjRound.join(frontier.select(col("v").as("src")), "src")
          .select(explode(col("nbrs")).as("v")).distinct()
          .join(visited, Seq("v"), "left_anti")
          .select(col("v"), lit(lvl + 1L).as("lvl"))
          .persist()
        if (next.isEmpty) { exhausted = true; next.unpersist() }
        else {
          levels = next :: levels
          visited = visited.unionAll(next)
          frontier = next
          lvl += 1
        }
      }
      if (!exhausted)
        throw new IllegalStateException(
          s"bfsLevels hit the $maxRounds-round cap with a non-empty frontier: " +
            "root eccentricity exceeds the cap; emitting truncated levels would be wrong")
      // store the result (scratch parquet) before the finally-block
      // unpersists the level caches: a cache-materialized result is
      // invalidated by those unpersists (every later read re-runs the full
      // BFS), while the stored table is a plain file scan forever. See
      // Materialize.toStorage.
      graft.Materialize.toStorage(visited.groupBy("lvl")
        .agg(count(lit(1)).as("n_vertices"), min("v").as("min_part"), max("v").as("max_part"))
        .select(col("lvl").as("level"), col("n_vertices"), col("min_part"), col("max_part"))
        .orderBy("level"), "bfs_levels")
    } finally {
      levels.foreach(_.unpersist())
      adjBuild.unpersist()
    }
  }

  /** g05: the peel-round count. Fixed (not a cap): BOTH engines run
    * exactly this many peel layers, so the emitted profiles align
    * row-for-row — converged rounds are explicit no-op rows (0 removed),
    * never silently elided. 12 covers the measured cascade depth (the
    * fixture's collapse completes in ≤ 8 rounds at every SF) with slack.
    */
  val MaxPeelRounds = 12

  /** g05 core: the k-core PEEL CASCADE PROFILE at k = ⌊2|E|∕|V|⌋ + 1
    * (one above mean degree, derived from the data in integer
    * arithmetic — the LSH-bits discipline). Each round drops every
    * vertex whose degree among survivors is < k and reports what the
    * round did: removed count, surviving vertices/edges. The profile is
    * the graph-curation AUDIT: on a graph with a dense backbone it
    * converges onto the backbone; on a near-regular graph (this
    * fixture — degree census min 38, median ~118 at sf0.1) removing the
    * below-mean tail cascades to a TOTAL collapse in ~3 rounds, and the
    * profile shows exactly that, which is the finding (no community
    * core exists to extract). Per-round work ∝ the shrinking survivor
    * set; the per-round driver traffic is 3 audit scalars (this is a
    * summary operator — its whole OUTPUT is ~12 rows of scalars), and
    * after convergence the remaining no-op rows are synthesized without
    * jobs.
    */
  private[operators] def kCorePeel(e: DataFrame,
                                   rounds: Int = MaxPeelRounds,
                                   sharedDeg: Option[DataFrame] = None): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // The survivor DEGREE FRAME is the round's single shuffle, and its one
    // agg yields EVERY audit scalar the round needs: n_vertices = its row
    // count (a vertex survives iff it still touches an edge), n_edges =
    // Σdeg ∕ 2 (each undirected edge credits both endpoints), and n_weak
    // for the NEXT round = count(deg < k). The previous form ran three
    // extra shuffling jobs per round (weak.count() recomputed the deg
    // groupBy, next.count() rescanned, and a union+distinct vCount
    // duplicated the deg shuffle the next round rebuilt anyway).
    //
    // Iterative-state discipline is g02b/g08's scratch-carry VERBATIM:
    // each round's survivor edges and degree frame go to scratch parquet,
    // so every later read is a flat file scan. The persist/unpersist form
    // was measured 3× SLOWER than even the pre-fold code here: Spark's
    // non-cascading unpersist (SPARK-24596) drops the cached DATA of every
    // dependent entry, so unpersisting round r−2's frames invalidated
    // rounds r−1 and r and each subsequent action re-ran the whole
    // anti-join cascade from the source (measured 42 s vs 16 s at sf0.1).
    def degOf(edges: DataFrame): DataFrame =
      edges.select(col("u").as("x")).unionAll(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
    def audit(deg: DataFrame, k: Long): (Long, Long, Long) = {
      val r = deg.agg(
        count(lit(1)).as("nv"),
        coalesce(sum(col("deg")), lit(0L)).as("sumdeg"),
        count(when(col("deg") < k, 1)).as("nweak")).head()
      (r.getLong(0), r.getLong(1) / 2L, r.getLong(2))
    }
    // sharedDeg (the catalog entry passes degFixture): e is then already
    // a flat fixture scan and its degree table pre-built — neither round-0
    // scratch copy is needed, the fixtures ARE that storage.
    var alive = sharedDeg match {
      case Some(_) => e.select("u", "v")
      case None => spark.read.parquet(
        graft.Materialize.toStoragePath(e.select("u", "v"), "kcore_e0"))
    }
    var aliveDeg = sharedDeg.map(_.select("x", "deg")).getOrElse(spark.read.parquet(
      graft.Materialize.toStoragePath(degOf(alive), "kcore_d0")))
    val (v0, e0, _) = audit(aliveDeg, Long.MaxValue)
    val k = 2L * e0 / v0 + 1L
    // Bootstrap n_weak for round 1 with k now known — a second tiny agg
    // over the |V|-row stored deg frame, not an edge shuffle.
    var nV = v0; var nE = e0; var nWeak = audit(aliveDeg, k)._3
    var converged = false
    val profile = (1 to rounds).map { r =>
      if (converged) (r.toLong, k, 0L, nV, nE)
      else if (nWeak == 0L) { converged = true; (r.toLong, k, 0L, nV, nE) }
      else {
        val removed = nWeak
        val weak = aliveDeg.filter(col("deg") < k).select("x")
        val next = spark.read.parquet(graft.Materialize.toStoragePath(alive
          .join(weak.withColumnRenamed("x", "u"), Seq("u"), "left_anti")
          .join(weak.withColumnRenamed("x", "v"), Seq("v"), "left_anti")
          .select("u", "v"), s"kcore_e$r"))
        alive = next
        val nextDeg = spark.read.parquet(
          graft.Materialize.toStoragePath(degOf(next), s"kcore_d$r"))
        aliveDeg = nextDeg
        val (nv2, ne2, nw2) = audit(nextDeg, k)
        nV = nv2; nE = ne2; nWeak = nw2
        (r.toLong, k, removed, nV, nE)
      }
    }
    profile.toDF("round", "k", "n_removed", "n_vertices", "n_edges")
      .orderBy("round")
  }

  /** g11: fixed LPA round count — both engines unroll exactly this many
    * label-propagation layers (the g02b/g05 discipline), so the profiles
    * align row-for-row. Synchronous LPA can oscillate on near-bipartite
    * structure; a fixed unroll makes that visible in the n_moved column
    * instead of hiding it behind a convergence test.
    */
  val LpaRounds = 4

  /** g12: truss parameter — a surviving edge must sit in ≥ KTrussK−2
    * triangles among surviving edges (k = 4 ⇒ support ≥ 2).
    */
  val KTrussK = 4L

  /** g12: row cap above which a removal-set join is NOT broadcast-hinted
    * (falls back to a shuffle join AQE may still re-plan). 2M two-long
    * rows ≈ 32 MB serialized — comfortably inside executor broadcast
    * budgets; anything bigger means the peel is removing a large
    * fraction of |E| and a forced broadcast would be the OOM risk, not
    * the optimization.
    */
  val TrussBroadcastMaxRows = 2000000L

  /** g12: fixed peel-round unroll — both engines run exactly this many
    * support/peel layers (the g11/e08b rule). NOT convergence-gated: a
    * graph still peeling at the last round shows n_removed > 0 there,
    * honestly, instead of hiding unfinished work behind a cap.
    */
  val TrussRounds = 4

  /** g12 core: K-TRUSS peel profile — the edge-support analog of g05's
    * vertex k-core: each round computes per-edge triangle support with
    * the SAME oriented-intersect kernel the triangle family shares
    * (degAnnotatedEdges → orientedTrianglesFrom: shuffles carry only
    * edges and O(√E)-bounded adjacency arrays, never Σdeg² wedge rows),
    * then removes every edge in fewer than k−2 surviving triangles.
    * Truss decomposition is the standard cohesion filter a co-purchase
    * graph gets before community mining (Cohen 2008, "Trusses:
    * cohesive subgraphs for social network analysis") — triangles, not
    * degrees, so a hub-and-spoke star (which survives k-core) peels
    * away while a dense clique core stays. Round r reports the census
    * of the edge set ENTERING the round (n_edges, n_triangles) plus
    * what the round removed — all three scalars from ONE agg over the
    * scratch-stored support frame (the g05 audit discipline); rounds
    * after convergence are no-op rows carrying the fixed census.
    * Survivor edges scratch-carry between rounds (g02b/g05: every
    * later read is a flat file scan; work per round ∝ the shrinking
    * survivor set).
    */
  private[operators] def kTrussPeel(e: DataFrame,
                                    rounds: Int = TrussRounds,
                                    sharedTris: Option[DataFrame] = None,
                                    sharedSup: Option[DataFrame] = None): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val minSup = KTrussK - 2L
    // SUPPORT-DECREMENT peel, the real k-truss algorithm: triangles are
    // enumerated ONCE (the g01 kernel) into scratch; round 1 counts full
    // supports; every later round only touches triangles ADJACENT TO
    // THE LAST ROUND'S REMOVALS. The removal sets are tiny relative to
    // |E| (measured at sf0.1: 62k / 22k / 1.7k / 658 of 1.2M edges), so
    // each incremental round is broadcast-join scans of the triangle
    // table — no |T|-row shuffle, no kernel rebuild. Two rejected forms
    // are on record: the kernel-per-round original (20.5 s — 4 full
    // rebuilds) and a semi-join "shrinking triangle table" cut (still
    // 20 s: the alive set shrinks only ~7%, so re-counting ALL
    // supports each round shuffles ~everything every round).
    // Correctness is decrement algebra: sup_r(e) = sup_{r-1}(e) − #(
    // triangles containing e whose FIRST removed edge fell in round
    // r-1) — each newly-dead triangle decrements each of its surviving
    // edges exactly once (dedup by triangle, not by removed edge, so a
    // triangle losing TWO edges in one round still counts once), which
    // inductively keeps sup_r(e) = #triangles fully inside the round-r
    // survivor subgraph — the exact quantity the rebuild computed. The
    // oracle restates the peel as full per-layer recounts; the two are
    // equal by the same induction, and the sf0.01 gate + the K4/C5/K5/
    // shared-pair closed forms pin it.
    // triangle source: the per-JVM shared fixture when the caller holds
    // one (the catalog entry passes trisFixture — built once, read by
    // g01/g04/g07/g12 alike), else the inline g01-kernel build. Either
    // way each per-round read maps (a, b, c) → the three canonical edge
    // keys in-row — a narrow projection over a flat scan.
    val triSrc = sharedTris.getOrElse {
      val wd = degAnnotatedEdges(e.select("u", "v"))
      val t = spark.read.parquet(graft.Materialize.toStoragePath(
        orientedTrianglesFrom(wd), "ktruss_tris"))
      wd.unpersist()
      t
    }
    val tris = triSrc.select(
      least(col("a"), col("b")).as("e1u"), greatest(col("a"), col("b")).as("e1v"),
      least(col("a"), col("c")).as("e2u"), greatest(col("a"), col("c")).as("e2v"),
      least(col("b"), col("c")).as("e3u"), greatest(col("b"), col("c")).as("e3v"))
    // current sup frame: (u, v, sup) for the edges still alive ENTERING
    // the round; round 1 counts the full graph
    var sup: DataFrame = null
    // last round's removals / cumulative removals before them — usually
    // metadata-sized (measured sf0.1: 62k/22k/1.7k/658 of 1.2M edges),
    // so broadcast; but "usually" is not a guarantee (a K chosen high
    // relative to density peels MOST edges, and removedPrior → |E|), so
    // the hint is GATED on the exact row count the peel already tracks —
    // past the cap the join degrades to a plain shuffle join instead of
    // risking a driver/executor OOM on a forced |E|-row broadcast.
    var removedLast: DataFrame = null
    var removedPrior: DataFrame = null
    var removedLastN = 0L
    var removedPriorN = 0L
    var converged = false
    var nEdges = 0L
    var nTris = 0L
    def edgeKeyed(rm: DataFrame, i: Int) =
      rm.select(col("u").as(s"e${i}u"), col("v").as(s"e${i}v"))
    def gated(df: DataFrame, n: Long): DataFrame =
      if (n <= TrussBroadcastMaxRows) broadcast(df) else df
    val profile = (1 to rounds).map { r =>
      if (converged) (r.toLong, KTrussK, 0L, nEdges, nTris)
      else {
        if (r == 1) {
          // round-1 full supports: the shared per-edge support fixture
          // when the caller holds one (supFixture — the identical table
          // g04 consumes), else the inline credits aggregation.
          sup = sharedSup.map(_.select("u", "v", "sup")).getOrElse {
            val credits = tris
              .select(explode(array(
                struct(col("e1u").as("u"), col("e1v").as("v")),
                struct(col("e2u").as("u"), col("e2v").as("v")),
                struct(col("e3u").as("u"), col("e3v").as("v")))).as("e"))
              .select(col("e.u").as("u"), col("e.v").as("v"))
              .groupBy("u", "v").agg(count(lit(1)).as("t"))
            spark.read.parquet(graft.Materialize.toStoragePath(
              e.select("u", "v").join(credits, Seq("u", "v"), "left")
                .select(col("u"), col("v"), coalesce(col("t"), lit(0L)).as("sup")),
              "ktruss_s1"))
          }
        } else {
          // newly-dead triangles: no edge removed before last round,
          // >= 1 edge removed last round — each counted once
          // round 2's removedPrior is always the empty seed — anti-joining
          // against it is three no-op passes over the triangle table
          val standing =
            if (removedPriorN == 0L) tris
            else Seq(1, 2, 3).foldLeft(tris) { (t, i) =>
              t.join(gated(edgeKeyed(removedPrior, i), removedPriorN),
                Seq(s"e${i}u", s"e${i}v"), "left_anti")
            }
          val flagged = Seq(1, 2, 3).foldLeft(standing) { (t, i) =>
            t.join(gated(edgeKeyed(removedLast, i).withColumn(s"f$i", lit(1)), removedLastN),
              Seq(s"e${i}u", s"e${i}v"), "left")
          }
          val dead = flagged
            .filter(col("f1").isNotNull || col("f2").isNotNull || col("f3").isNotNull)
          val dec = dead
            .select(explode(array(
              struct(col("e1u").as("u"), col("e1v").as("v")),
              struct(col("e2u").as("u"), col("e2v").as("v")),
              struct(col("e3u").as("u"), col("e3v").as("v")))).as("e"))
            .select(col("e.u").as("u"), col("e.v").as("v"))
            .groupBy("u", "v").agg(count(lit(1)).as("d"))
          sup = spark.read.parquet(graft.Materialize.toStoragePath(
            sup.filter(col("sup") >= minSup)
              .join(dec, Seq("u", "v"), "left")
              .select(col("u"), col("v"),
                (col("sup") - coalesce(col("d"), lit(0L))).as("sup")),
            s"ktruss_s$r"))
        }
        System.gc()
        val a = sup.agg(
          count(lit(1)).as("ne"),
          coalesce(sum(col("sup")), lit(0L)).as("st"),
          count(when(col("sup") < minSup, 1)).as("nw")).head()
        nEdges = a.getLong(0)
        nTris = a.getLong(1) / 3L
        val nWeak = a.getLong(2)
        if (nWeak == 0L) converged = true
        else {
          val rm = spark.read.parquet(graft.Materialize.toStoragePath(
            sup.filter(col("sup") < minSup).select("u", "v"), s"ktruss_r$r"))
          removedPrior =
            if (removedPrior == null) spark.read.parquet(graft.Materialize.toStoragePath(
              rm.limit(0), "ktruss_r0"))
            else spark.read.parquet(graft.Materialize.toStoragePath(
              removedPrior.unionByName(removedLast), s"ktruss_rc$r"))
          removedPriorN += removedLastN
          removedLast = rm
          removedLastN = nWeak
        }
        (r.toLong, KTrussK, nWeak, nEdges, nTris)
      }
    }
    profile.toDF("round", "k", "n_removed", "n_edges", "n_triangles")
      .orderBy("round")
  }

  /** g13: HITS iteration count and fixed-point score scale. Two full
    * hub/authority rounds, unrolled identically in both engines.
    */
  val HitsRounds = 2
  val HitsScale = 1000000L

  /** Customer→part purchase edges (c, p), distinct — the BIPARTITE graph
    * g13 runs on (hubs = customers, authorities = parts), in contrast to
    * the part-part co-purchase projection the rest of the family uses.
    */
  private[operators] def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    fx(s, dir, "purchase")(Tables.orders(s, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey").as("ok"),
        col("l_partkey").as("p")), "ok")
      .select("c", "p").distinct())

  /** g13 core: HITS hubs-and-authorities (Kleinberg 1999) on the
    * customer–part bipartite graph, in the engine's integer fixed-point
    * form: authority(p) = Σ hub(c) over buyers, hub(c) = Σ authority(p)
    * over basket — each half-step renormalized by the MAX score
    * (floor(s·Scale ∕ max), an integer division both engines compute
    * identically; the classic L2 norm is a float no hash gate can pin).
    * Products run in decimal(38,0)/HUGEINT so a 100 TB corpus (1e9
    * buyers × 1e6 scale) cannot overflow the intermediate. Output is the
    * top-10 of each side, (score DESC, id ASC)-pinned — the "most
    * structurally important customers/products" ranking, which degree
    * alone gets wrong when a mid-degree customer buys exactly the
    * authoritative parts. Scale shape: two |E|-row equi-join + hash-agg
    * shuffles per round plus a broadcast 1-row max — no window over |E|,
    * nothing driver-side but the loop constants.
    */
  private[operators] def hitsProfile(ed: DataFrame): DataFrame = {
    val spark = ed.sparkSession
    val edges = ed
    // Iterative-state discipline: each half-step's raw score frame goes
    // to SCRATCH parquet (the g02b/g05 carry), so every later read —
    // the max-agg, the next half-step's join, the final top-10 — is a
    // flat file scan. The persist-only form was measured at 18 s/pass
    // at sf0.001 on 6k rows: with the full lineage still in every plan,
    // each of the ~12 actions re-planned the whole growing tree (the
    // same driver-bound failure as the CC loop). The max is ONE 1-row
    // audit scalar per half-step (the g05 head() pattern), inlined as a
    // literal — no crossJoin, no broadcast stage. Sums stay in long
    // (≤ |E_key|·Scale ≤ 1e15 at a 1e9-degree hub) and the renormalized
    // product runs in decimal(38,0), so no intermediate can overflow.
    def renorm(raw: DataFrame, key: String, out: String, tag: String): DataFrame = {
      val stored = spark.read.parquet(graft.Materialize.toStoragePath(raw, tag))
      val m = stored.agg(max(col("s"))).head().getLong(0)
      stored.select(col(key),
        expr(s"CAST((CAST(s AS DECIMAL(38,0)) * $HitsScale) DIV CAST($m AS DECIMAL(38,0)) AS BIGINT)")
          .as(out))
    }
    var hub = edges.select(col("c")).distinct().withColumn("h", lit(HitsScale))
    var auth: DataFrame = null
    (1 to HitsRounds).foreach { i =>
      auth = renorm(
        edges.join(hub, "c").groupBy("p").agg(sum(col("h")).as("s")), "p", "a", s"hits_a$i")
      hub = renorm(
        edges.join(auth, "p").groupBy("c").agg(sum(col("a")).as("s")), "c", "h", s"hits_h$i")
    }
    val topA = auth.orderBy(col("a").desc, col("p").asc).limit(10)
      .select(lit("authority").as("side"),
        row_number().over(Window.orderBy(col("a").desc, col("p").asc)).cast("long").as("rank"),
        col("p").as("node_id"), col("a").as("score"))
    val topH = hub.orderBy(col("h").desc, col("c").asc).limit(10)
      .select(lit("hub").as("side"),
        row_number().over(Window.orderBy(col("h").desc, col("c").asc)).cast("long").as("rank"),
        col("c").as("node_id"), col("h").as("score"))
    topA.unionByName(topH).orderBy("side", "rank")
  }

  /** g11 core: synchronous label-propagation COMMUNITY DETECTION over the
    * co-purchase graph — the classic modularity-free community pass
    * (Raghavan et al. 2007) in its deterministic form: every vertex
    * starts labeled with itself; each round it takes the label most
    * frequent among its neighbors, ties broken by SMALLEST label (the
    * min-label discipline d07's CC uses), all vertices updating
    * synchronously. The output is the per-round convergence profile
    * (community count, moved count, largest community, a modular label
    * checksum that pins the actual assignment under the hash gate), not
    * a |V|-row dump. Scale shape: one |2E|-row join + two hash aggs per
    * round, labels scratch-carried (the g02b discipline — constant-size
    * scan plans, survives executor loss); the frequency argmax is a
    * min(struct(-cnt, lbl)) — no window sort over the message stream.
    */
  private[operators] def lpaProfile(e: DataFrame,
                                    rounds: Int = LpaRounds): DataFrame = {
    val spark = e.sparkSession
    val msgs = spark.read.parquet(graft.Materialize.toStoragePath(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst"))), "lpa_msgs"))
    lpaProfileFromParts(msgs, msgs.select(col("dst").as("x")).distinct(), rounds)
  }

  /** g11 over pre-stored directed message edges ((src, dst) — msgsFixture
    * works verbatim) and the vertex set.
    */
  private[operators] def lpaProfileFromParts(msgs: DataFrame, verts: DataFrame,
                                             rounds: Int = LpaRounds): DataFrame = {
    val spark = msgs.sparkSession
    import spark.implicits._
    var lbls = spark.read.parquet(graft.Materialize.toStoragePath(
      verts.select(col("x"), col("x").as("lbl")), "lpa_l0"))
    val profile = (1 to rounds).map { r =>
      // one store job per round: message join → per-(dst, label) count →
      // deterministic argmax → carry the previous label alongside so the
      // audit is a scan of THIS round's frame only
      val nextPath = graft.Materialize.toStoragePath(
        msgs.join(lbls.select(col("x").as("src"), col("lbl")), "src")
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst"))
          .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("pick"))
          .select(col("dst").as("x"), col("pick.l").as("lbl"))
          .join(lbls.select(col("x"), col("lbl").as("prev_lbl")), "x"), s"lpa_l$r")
      val next = spark.read.parquet(nextPath)
      val a = next.agg(
        countDistinct("lbl").as("nc"),
        count(when(col("lbl") =!= col("prev_lbl"), 1)).as("moved"),
        sum(pmod(col("lbl"), lit(1000003L))).as("cks")).head()
      val largest = next.groupBy("lbl").agg(count(lit(1)).as("csz"))
        .agg(max("csz")).head().getLong(0)
      lbls = next.select(col("x"), col("lbl"))
      (r.toLong, a.getLong(0), a.getLong(1), largest, a.getLong(2))
    }
    profile.toDF("round", "n_communities", "n_moved", "largest_community",
      "label_checksum").orderBy("round")
  }

  /** g04 core: per-edge neighborhood Jaccard — link-strength scoring (how
    * substitutable are two co-purchased parts). |N(u)∩N(v)| for an edge is
    * exactly the number of triangles through it, so the common-neighbor
    * counts come from g01's oriented adjacency-array intersection with the
    * intersection MATERIALIZED (explode) instead of counted: rows produced
    * = 3·|triangles| credit rows, never the Σ deg² wedge space, and every
    * per-row array is degree-oriented (O(√E) bound). Jaccard =
    * t / (du + dv − t) — one IEEE division of exact longs per edge, so
    * ordering and values gate exactly.
    */
  /** One row per triangle {a, b, c}, each found exactly once on its
    * degree-lowest edge (a, b) — g01's degree-oriented adjacency-array
    * intersection with the intersection MATERIALIZED (explode) instead of
    * counted. Shared by g04 (per-edge credits) and g07 (per-vertex
    * credits). shuffle_hash, not sort-merge: the probe side carries two
    * ~O(√E) LONG-array payloads per row, and sorting those heavy rows is
    * the dominant 10×-probe cost; hashing builds on the (|V|-row)
    * adjacency side and streams the edges unsorted.
    */
  private[operators] def orientedTriangles(e: DataFrame): DataFrame =
    orientedTrianglesFrom(degAnnotatedEdges(e))

  /** orientedTriangles for a caller that already holds the materialized
    * degAnnotatedEdges frame (edgeJaccard's final join reuses it — no
    * second degree derivation anywhere in the plan).
    */
  private[operators] def orientedTrianglesFrom(wd: DataFrame): DataFrame = {
    val oriented = orientedFrom(wd)
    val adj = orientedAdjacency(oriented)
    oriented
      .join(adj.select(col("x").as("a"), col("nbrs").as("na")).hint("shuffle_hash"), "a")
      .join(adj.select(col("x").as("b"), col("nbrs").as("nb")).hint("shuffle_hash"), "b")
      .select(col("a"), col("b"),
        explode(graft.functions.ArrayFunctions.sorted_intersect(col("na"), col("nb"))).as("c"))
  }

  private[operators] def edgeJaccard(e: DataFrame, topK: Int): DataFrame = {
    val wd = degAnnotatedEdges(e)
    edgeJaccardFrom(wd, orientedTrianglesFrom(wd), topK)
  }

  /** g04 over pre-built (fixture-shared) frames: wd = degree-annotated
    * edges, tris = the oriented triangle rows.
    */
  private[operators] def edgeJaccardFrom(wd: DataFrame, tris: DataFrame,
                                         topK: Int): DataFrame = {
    // 3 undirected edge credits per triangle
    val credits = tris.select(
      array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v"))
      ).as("es"))
      .select(explode(col("es")).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("t"))
    // the final per-edge degree columns ride the SAME cached annotated
    // frame — the pre-fix two extra degree joins are gone entirely
    wd.join(credits, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("t"), lit(0L)).as("common_nbrs"),
        col("du").as("deg_u"), col("dv").as("deg_v"))
      .withColumn("jaccard", col("common_nbrs").cast("double") /
        (col("deg_u") + col("deg_v") - col("common_nbrs")).cast("double"))
      .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
      .limit(topK)
  }

  /** g04 from the shared per-edge support table (supFixture) — sup covers
    * every edge (triangle-free edges carry 0), so the inner join is the
    * old left-join-with-coalesce verbatim.
    */
  private[operators] def edgeJaccardFromSup(wd: DataFrame, sup: DataFrame,
                                            topK: Int): DataFrame =
    wd.join(sup.select("u", "v", "sup"), Seq("u", "v"))
      .select(col("u"), col("v"), col("sup").as("common_nbrs"),
        col("du").as("deg_u"), col("dv").as("deg_v"))
      .withColumn("jaccard", col("common_nbrs").cast("double") /
        (col("deg_u") + col("deg_v") - col("common_nbrs")).cast("double"))
      .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
      .limit(topK)

  /** g07 core: the LOCAL clustering-coefficient HISTOGRAM — per-vertex
    * triangle counts from the shared orientedTriangles rows (3 vertex
    * credits per triangle), bucketed by the integer floor of
    * 10·cc(v) = (2·t·10) div (deg·(deg−1)) over the deg ≥ 2 vertices
    * (cc is undefined below that), so the 11-bucket histogram is exact
    * integer arithmetic end to end — no per-vertex double ever crosses
    * the gate. Buckets keep the output metadata-sized where the raw
    * per-vertex frame is |V| rows; zero-triangle vertices land in bucket
    * 0 via the left join (they are the signal — g01's GLOBAL coefficient
    * can't see a bimodal local structure, this histogram can).
    */
  private[operators] def localClusteringHistogram(e: DataFrame): DataFrame = {
    val wd = degAnnotatedEdges(e)
    localClusteringHistogramFrom(wd, orientedTrianglesFrom(wd))
  }

  /** g07 over pre-built (fixture-shared) frames — see edgeJaccardFrom. */
  private[operators] def localClusteringHistogramFrom(wd: DataFrame,
                                                      tris: DataFrame): DataFrame = {
    val tv = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("z"))
      .groupBy("z").agg(count(lit(1)).as("t"))
    // per-vertex degree from the cached annotated frame (one distinct,
    // no second degree agg)
    wd.select(col("u").as("x"), col("du").as("deg"))
      .unionAll(wd.select(col("v").as("x"), col("dv").as("deg"))).distinct()
      .filter(col("deg") >= 2)
      .join(tv.withColumnRenamed("z", "x"), Seq("x"), "left")
      .select(col("deg"), coalesce(col("t"), lit(0L)).as("t"))
      .select(expr("(2 * t * 10) div (deg * (deg - 1))").as("cc_bucket"), col("t"))
      .groupBy("cc_bucket")
      .agg(count(lit(1)).as("n_vertices"), sum("t").as("sum_triangles"))
      .orderBy("cc_bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TRIANGLE COUNT + global clustering coefficient. Degree-ordered
    // orientation → every triangle has exactly one source vertex with
    // both out-edges, so each is counted once — by intersecting the two
    // endpoints' out-adjacency arrays in-row (see triangleStats for why
    // this beats a wedge join). All integers; the coefficient is one
    // IEEE division of exact longs — bit-identical across engines.
    "g01_triangle_count" -> ((s, dir) =>
      triangleStatsFrom(degEdgesFixture(s, dir), trisFixture(s, dir))),

    // One PAGERANK round from the uniform state: every vertex sends
    // floor(RankScale / deg) along each incident edge; rank = exact
    // integer sum of incoming contributions. Two broadcast-or-shuffled
    // hash joins + one hash agg — the shape every BSP/Pregel round
    // lowers to on Spark. Top-25 hubs by rank.
    "g02_pagerank_step" -> ((s, dir) => pagerankStepFromMsgs(msgsFixture(s, dir), 25)),

    // PAGERANK TO (TOWARD) CONVERGENCE — g02's round compounded for a
    // fixed 8 damped iterations, surfacing the CONVERGENCE PROFILE
    // (per-round total movement, rank extremes, mass) instead of a final
    // snapshot: the audit a ranking pipeline reads to decide whether K
    // rounds were enough. All arithmetic is integer fixed-point (see
    // DampNum), so 8 compounded floor divisions land bit-identically in
    // both engines and the whole iteration sits under the hash gate —
    // the oracle unrolls the same 8 layers (g05's generated-layer
    // pattern).
    "g02b_pagerank_profile" -> ((s, dir) =>
      pagerankProfileFromParts(msgsFixture(s, dir), degFixture(s, dir))),

    // Single-source BFS level histogram from the busiest part — reach/
    // hop-distance profiling (how many hops cover the catalog from the
    // hub). Iterative frontier expansion; per-level vertex counts and id
    // ranges are all integers → exact oracle via a depth-capped
    // recursive-CTE closure with MIN(level) per vertex. Takes the raw
    // pair stream: the adjacency collect_set dedups, so the edge-distinct
    // shuffle g01/g02 need is skipped here.
    "g03_bfs_levels" -> ((s, dir) => bfsLevels(partPairs(s, dir))),

    // EDGE NEIGHBORHOOD JACCARD — top-100 strongest co-purchase links by
    // neighborhood overlap (the link-prediction / substitute-detection
    // score). Common neighbors per edge = triangles through it, computed
    // by materializing g01's oriented intersections (3 credit rows per
    // triangle); all counts exact longs, one division per edge.
    "g04_edge_jaccard" -> ((s, dir) =>
      edgeJaccardFromSup(degEdgesFixture(s, dir), supFixture(s, dir), 100)),

    // K-CORE PEEL PROFILE — the density-filter audit of graph curation:
    // peel vertices below k = mean-degree+1 (data-derived, integer
    // exact) round by round and report each round's removals and the
    // surviving graph size. The standard "dense backbone" extraction
    // (spam/fringe removal, community seeding) as iterative anti-join
    // peeling; on this near-regular fixture the cascade collapses the
    // graph — and the profile SHOWS it, which is the audit's job.
    "g05_kcore" -> ((s, dir) =>
      kCorePeel(partEdges(s, dir), sharedDeg = Some(degFixture(s, dir)))),

    // DEGREE ASSORTATIVITY — do hubs link to hubs (r > 0) or to leaves
    // (r < 0)? The one-number mixing audit a graph-curation pipeline
    // reads before trusting degree-based sampling. Over the DIRECTED
    // endpoint list (each undirected edge both ways) the x and y
    // marginals coincide, so Newman's r needs NO square root:
    // r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) — every term an integer
    // sum, the single final division double-exact in both engines (the
    // g01 clustering_coeff discipline). One degree join + one agg;
    // work-linear in |E| at any scale.
    "g06_assortativity" -> ((s, dir) =>
      degreeAssortativityFromParts(msgsFixture(s, dir), degFixture(s, dir))),

    // LOCAL CLUSTERING HISTOGRAM — the distributional companion to g01's
    // single global coefficient: how many vertices live at each tenth of
    // cc(v) = 2·t(v)/(deg·(deg−1)). The community-structure audit a graph
    // curation pipeline reads (a spam farm shows as a mass at bucket 10;
    // a star/bipartite core as a mass at 0) — g01's one number averages
    // both away. Triangle credits come from the same materialized
    // oriented intersection as g04 (3 vertex credits per triangle, never
    // the wedge space); the bucket floor is integer cross-multiplication,
    // so the whole histogram is hash-exact.
    "g07_local_clustering" -> ((s, dir) =>
      localClusteringHistogramFrom(degEdgesFixture(s, dir), trisFixture(s, dir))),

    // CONNECTED-COMPONENTS CONVERGENCE PROFILE — min-label propagation
    // for 12 fixed rounds: per-round label movement, distinct-label
    // count (= component count once movement hits zero), label-mass
    // checksum. The connectivity audit of graph curation, and the
    // fourth canonical Pregel shape in the family (d07 propagates to
    // convergence on sparse dup graphs; this PROFILES the mixing on the
    // dense co-purchase graph, where the convergence curve itself is
    // the answer). All integers — 12 compounded min-folds sit under the
    // hash gate against 12 generated MATERIALIZED oracle layers.
    "g08_cc_profile" -> ((s, dir) =>
      ccProfileFromParts(msgsFixture(s, dir), degFixture(s, dir).select("x"))),

    // DEGREE SPECTRUM — t31's frequency-spectrum audit lifted to the
    // graph: vertices per floor-log2-degree bucket (bitlength integers,
    // no float log) with degree mass and min/max, plus share columns.
    // The power-law sanity check run BEFORE committing to a graph
    // algorithm's cost model: g01/g04's √E adjacency bound and k01's
    // salting decisions both assume a heavy-tailed spectrum — this is
    // the audit that shows it. One |V|-row agg after the degree count;
    // everything downstream is ≤ 63 bucket rows.
    "g09_degree_spectrum" -> ((s, dir) => degreeSpectrumFromDeg(degFixture(s, dir))),

    // PROJECTION-COST AUDIT — the planning check run BEFORE building the
    // co-purchase graph: partPairs' cost is Σ_orders k(k−1)/2 (each
    // order of k items emits that many pairs), so bucket orders by
    // floor-log2(k) and show where the pair mass lives. This is the
    // measured form of this module's "per-order part sets are small, the
    // self-join is bounded per key" claim — a marketplace whose top
    // bucket carries most of the pair share needs a basket cap before
    // the projection, and this audit is what says so. One (order)-keyed
    // count agg, then ≤ 63 bucket rows.
    "g10_projection_cost" -> ((s, dir) => projectionCostAudit(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))),

    // LABEL-PROPAGATION COMMUNITIES — the classic near-linear community
    // detector in its deterministic synchronous form (most-frequent
    // neighbor label, min-label ties, LpaRounds unrolled in both
    // engines); output is the convergence PROFILE with a modular label
    // checksum pinning the assignment itself. See lpaProfile.
    "g11_lpa_communities" -> ((s, dir) =>
      lpaProfileFromParts(msgsFixture(s, dir), degFixture(s, dir).select("x"))),

    // K-TRUSS peel profile: triangle-support cohesion filter (see
    // kTrussPeel). One oriented-intersect triangle pass + one edge-keyed
    // count agg per round, survivors scratch-carried.
    "g12_ktruss" -> ((s, dir) =>
      kTrussPeel(partEdges(s, dir), sharedTris = Some(trisFixture(s, dir)),
        sharedSup = Some(supFixture(s, dir)))),

    // HITS hubs/authorities on the customer-part bipartite graph (see
    // hitsProfile). Two |E|-row join+agg shuffles per round, max-
    // renormalized in integers; output is the two top-10 rankings.
    "g13_hits" -> ((s, dir) => hitsProfile(purchaseEdges(s, dir))),

    // Personalized PageRank from the 4 highest-degree seeds (see
    // pprRanks): g02b's integer damped rounds with restart mass
    // re-injected at the seeds — the seed-expansion ranking behind
    // related-item panels and known-good-document curation harvests.
    "g14_ppr" -> ((s, dir) =>
      pprRanksFromParts(msgsFixture(s, dir), degFixture(s, dir))),

    // Degree-capped neighbor sampling (see neighborSample): the
    // GraphSAGE fan-out bound as a deterministic hash-rank pick, with
    // the per-degree-bucket kept/dropped census and a selection
    // checksum under the hash gate.
    "g15_neighbor_sample" -> ((s, dir) => neighborSampleFromMsgs(msgsFixture(s, dir)))
  )

  /** g10 core over (ok, pk) rows — extracted for closed-form baskets. */
  private[operators] def projectionCostAudit(li: DataFrame): DataFrame = {
    val sz = li.distinct().groupBy("ok").agg(count(lit(1)).as("k"))
    val tot = sz.agg(count(lit(1)).as("n_orders"),
      sum(expr("(k * (k - 1)) div 2")).as("total_pairs"))
    sz.groupBy((length(bin(col("k"))) - 1).cast("long").as("kb"))
      .agg(count(lit(1)).as("n_orders_b"), sum("k").as("item_mass"),
        sum(expr("(k * (k - 1)) div 2")).as("pair_mass"), max("k").as("max_k"))
      .crossJoin(broadcast(tot))
      .select(col("kb"), col("n_orders_b"), col("item_mass"), col("pair_mass"),
        col("max_k"),
        when(col("total_pairs") === 0L, lit(0.0))
          .otherwise(col("pair_mass").cast("double") / col("total_pairs").cast("double"))
          .as("pair_share"))
      .orderBy("kb")
  }

  /** g09 core over undirected (u < v) edges — extracted for closed-form
    * graphs (a star's hub/leaf split, K4's single regular bucket).
    */
  private[operators] def degreeSpectrum(e: DataFrame): DataFrame =
    degreeSpectrumFromDeg(degrees(e))

  /** g09 from a pre-built degree table (degFixture). */
  private[operators] def degreeSpectrumFromDeg(deg: DataFrame): DataFrame = {
    val tot = deg.agg(count(lit(1)).as("nv"), sum("deg").as("m2"))
    deg.groupBy((length(bin(col("deg"))) - 1).cast("long").as("db"))
      .agg(count(lit(1)).as("n_vertices"), sum("deg").as("deg_mass"),
        min("deg").as("min_deg"), max("deg").as("max_deg"))
      .crossJoin(broadcast(tot))
      .select(col("db"), col("n_vertices"), col("deg_mass"),
        col("min_deg"), col("max_deg"),
        (col("n_vertices").cast("double") / col("nv").cast("double")).as("v_share"),
        (col("deg_mass").cast("double") / col("m2").cast("double")).as("mass_share"))
      .orderBy("db")
  }

  def oracles: Map[String, String] = Map(
    // the peel unrolled to exactly TrussRounds layers: per round the
    // wedge-join triangle listing (g01's oriented form), 3 edge credits
    // per triangle, LEFT-joined support (edges in no triangle count 0),
    // census scalars, then the survivor edge set for the next layer
    "g12_ktruss" -> {
      val minSup = KTrussK - 2L
      val layers = (1 to TrussRounds).map { i =>
        s"""dg$i AS (
           |  SELECT x, COUNT(*) AS deg
           |  FROM (SELECT u AS x FROM te${i - 1} UNION ALL SELECT v FROM te${i - 1})
           |  GROUP BY x
           |), og$i AS MATERIALIZED (
           |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS a,
           |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS b
           |  FROM te${i - 1} e JOIN dg$i du ON du.x = e.u JOIN dg$i dv ON dv.x = e.v
           |), tr$i AS MATERIALIZED (
           |  SELECT e1.a AS a, e1.b AS x, e2.b AS y
           |  FROM og$i e1 JOIN og$i e2 ON e1.a = e2.a AND e1.b < e2.b
           |  JOIN te${i - 1} t ON t.u = e1.b AND t.v = e2.b
           |), cr$i AS (
           |  SELECT LEAST(a, x) AS u, GREATEST(a, x) AS v FROM tr$i
           |  UNION ALL SELECT LEAST(a, y), GREATEST(a, y) FROM tr$i
           |  UNION ALL SELECT x, y FROM tr$i
           |), sup$i AS MATERIALIZED (
           |  SELECT e.u, e.v, COALESCE(c.t, 0) AS sup
           |  FROM te${i - 1} e LEFT JOIN
           |    (SELECT u, v, COUNT(*) AS t FROM cr$i GROUP BY u, v) c
           |    ON c.u = e.u AND c.v = e.v
           |), row$i AS (
           |  SELECT CAST($i AS BIGINT) AS round, CAST($KTrussK AS BIGINT) AS k,
           |    (SELECT COUNT(CASE WHEN sup < $minSup THEN 1 END) FROM sup$i) AS n_removed,
           |    (SELECT COUNT(*) FROM sup$i) AS n_edges,
           |    (SELECT CAST(COALESCE(SUM(sup), 0) // 3 AS BIGINT) FROM sup$i) AS n_triangles
           |), te$i AS MATERIALIZED (
           |  SELECT u, v FROM sup$i WHERE sup >= $minSup
           |)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to TrussRounds)
        .map(i => s"SELECT * FROM row$i").mkString("\n|", "\n|UNION ALL ", "")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), te0 AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |),
         |$layers
         |SELECT * FROM ($unionAll
         |) ORDER BY round""".stripMargin
    },

    // the two HITS rounds unrolled: HUGEINT sums, floor-div max
    // renormalization per half-step, both top-10 rankings pinned by
    // (score DESC, id ASC)
    "g13_hits" -> {
      val rounds = (1 to HitsRounds).map { i =>
        s"""a${i}r AS (
           |  SELECT p, SUM(h) AS s FROM ed JOIN h${i - 1} USING (c) GROUP BY p
           |), a$i AS MATERIALIZED (
           |  SELECT p, CAST(s AS HUGEINT) * $HitsScale // (SELECT MAX(CAST(s AS HUGEINT)) FROM a${i}r) AS a
           |  FROM a${i}r
           |), h${i}r AS (
           |  SELECT c, SUM(a) AS s FROM ed JOIN a$i USING (p) GROUP BY c
           |), h$i AS MATERIALIZED (
           |  SELECT c, CAST(s AS HUGEINT) * $HitsScale // (SELECT MAX(CAST(s AS HUGEINT)) FROM h${i}r) AS h
           |  FROM h${i}r
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |), h0 AS (
         |  SELECT DISTINCT c, CAST($HitsScale AS HUGEINT) AS h FROM ed
         |),
         |$rounds
         |SELECT side, rank, node_id, score FROM (
         |  SELECT 'authority' AS side, rank, node_id, score FROM (
         |    SELECT ROW_NUMBER() OVER (ORDER BY a DESC, p ASC) AS rank,
         |      p AS node_id, CAST(a AS BIGINT) AS score FROM a$HitsRounds
         |  ) WHERE rank <= 10
         |  UNION ALL
         |  SELECT 'hub', rank, node_id, score FROM (
         |    SELECT ROW_NUMBER() OVER (ORDER BY h DESC, c ASC) AS rank,
         |      c AS node_id, CAST(h AS BIGINT) AS score FROM h$HitsRounds
         |  ) WHERE rank <= 10
         |) ORDER BY side, rank""".stripMargin
    },

    // g02b's unrolled-layer template with the seeded restart: the (1−d)
    // base joins in per layer (LEFT JOIN seeds), floor-division integer
    // arithmetic identical to the engine's div chain
    "g14_ppr" -> {
      val seedBase = RankScale * (DampDen - DampNum) / DampDen
      val layers = (1 to PprRounds).map { i =>
        s"""m$i AS MATERIALIZED (
           |  SELECT nb.dst AS x, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m
           |  FROM nb JOIN deg d ON d.x = nb.src JOIN r${i - 1} r ON r.x = nb.src
           |  GROUP BY nb.dst
           |), r$i AS MATERIALIZED (
           |  SELECT m.x, COALESCE(s.sb, 0) + m.m * $DampNum // $DampDen AS rank
           |  FROM m$i m LEFT JOIN seeds s ON s.x = m.x
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), deg AS MATERIALIZED (
         |  SELECT src AS x, COUNT(*) AS deg FROM nb GROUP BY src
         |), seeds AS MATERIALIZED (
         |  SELECT x, CAST($seedBase AS BIGINT) AS sb FROM deg
         |  ORDER BY deg DESC, x ASC LIMIT $PprSeedK
         |), r0 AS MATERIALIZED (
         |  SELECT d.x,
         |    CASE WHEN s.x IS NOT NULL THEN CAST($RankScale AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS rank
         |  FROM deg d LEFT JOIN seeds s ON s.x = d.x
         |),
         |$layers
         |SELECT r.x AS part_id, CAST(r.rank AS BIGINT) AS rank,
         |  s.x IS NOT NULL AS is_seed
         |FROM r$PprRounds r LEFT JOIN seeds s ON s.x = r.x
         |ORDER BY rank DESC, part_id ASC LIMIT 20""".stripMargin
    },

    // the hash rank restated through the xxhash64 single-long chain
    // (p14's machinery) on the same combined key; window + census
    // restated verbatim
    "g15_neighbor_sample" ->
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), ids AS (
         |  SELECT src, dst, CAST(src * 100000007 + dst AS HUGEINT) AS x FROM nb
         |), ${DuckHash.xxhash64LongCtes("src, dst")}, r AS (
         |  SELECT src, dst, hv,
         |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY hv ASC, dst ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY src) AS deg
         |  FROM hashed
         |), b AS (
         |  SELECT CAST(length(bin(deg)) AS BIGINT) AS bucket, src, hv,
         |    rn <= $SampleK AS kept
         |  FROM r
         |)
         |SELECT bucket, CAST(COUNT(DISTINCT src) AS BIGINT) AS n_vertices,
         |  COUNT(*) AS edges_total,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS edges_kept,
         |  CAST(SUM(CASE WHEN kept THEN ((hv % 1000000007) + 1000000007) % 1000000007
         |            ELSE 0 END) AS BIGINT) AS keep_checksum,
         |  1.0 - CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS drop_fraction
         |FROM b GROUP BY bucket
         |ORDER BY bucket""".stripMargin,
    // the LpaRounds layers unrolled as generated MATERIALIZED CTEs (the
    // g02b template); the frequency argmax restated as ROW_NUMBER over
    // (cnt DESC, lbl ASC) — same deterministic pick as the engine's
    // min(struct(-cnt, lbl))
    "g11_lpa_communities" -> {
      val layers = (1 to LpaRounds).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT nb.dst, l.lbl, COUNT(*) AS cnt
           |  FROM nb JOIN l${i - 1} l ON l.x = nb.src
           |  GROUP BY nb.dst, l.lbl
           |), l$i AS MATERIALIZED (
           |  SELECT p.dst AS x, p.lbl, pr.lbl AS prev_lbl
           |  FROM (SELECT dst, lbl, ROW_NUMBER() OVER (PARTITION BY dst
           |          ORDER BY cnt DESC, lbl ASC) AS rn FROM c$i) p
           |  JOIN l${i - 1} pr ON pr.x = p.dst
           |  WHERE p.rn = 1
           |), row$i AS MATERIALIZED (
           |  SELECT CAST($i AS BIGINT) AS round,
           |    CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_communities,
           |    CAST(SUM(CASE WHEN lbl <> prev_lbl THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_moved,
           |    (SELECT CAST(MAX(csz) AS BIGINT) FROM
           |       (SELECT COUNT(*) AS csz FROM l$i GROUP BY lbl))
           |      AS largest_community,
           |    CAST(SUM(lbl % 1000003) AS BIGINT) AS label_checksum
           |  FROM l$i
           |)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to LpaRounds).map(i => s"SELECT * FROM row$i")
        .mkString("\n|", "\n|UNION ALL ", "")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), l0 AS MATERIALIZED (
         |  SELECT DISTINCT dst AS x, dst AS lbl FROM nb
         |),
         |$layers$unionAll
         |ORDER BY round""".stripMargin
    },

    // the same per-order pair arithmetic; SUMs cast back to BIGINT
    "g10_projection_cost" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), sz AS (
        |  SELECT ok, COUNT(*) AS k FROM li GROUP BY ok
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM((k * (k - 1)) // 2) AS BIGINT) AS total_pairs
        |  FROM sz
        |), spec AS (
        |  SELECT CAST(length(bin(k)) - 1 AS BIGINT) AS kb, COUNT(*) AS n_orders_b,
        |    CAST(SUM(k) AS BIGINT) AS item_mass,
        |    CAST(SUM((k * (k - 1)) // 2) AS BIGINT) AS pair_mass, MAX(k) AS max_k
        |  FROM sz GROUP BY 1
        |)
        |SELECT kb, n_orders_b, item_mass, pair_mass, max_k,
        |  CASE WHEN total_pairs = 0 THEN 0.0
        |       ELSE CAST(pair_mass AS DOUBLE) / CAST(total_pairs AS DOUBLE) END AS pair_share
        |FROM spec CROSS JOIN tot
        |ORDER BY kb""".stripMargin,

    // the shared edge CTE + t31's bitlength bucketing; SUMs cast back to
    // BIGINT (dtype-strict rule)
    "g09_degree_spectrum" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), deg AS (
        |  SELECT x, COUNT(*) AS deg
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY x
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nv, CAST(SUM(deg) AS BIGINT) AS m2 FROM deg
        |), spec AS (
        |  SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS db, COUNT(*) AS n_vertices,
        |    CAST(SUM(deg) AS BIGINT) AS deg_mass,
        |    MIN(deg) AS min_deg, MAX(deg) AS max_deg
        |  FROM deg GROUP BY 1
        |)
        |SELECT db, n_vertices, deg_mass, min_deg, max_deg,
        |  CAST(n_vertices AS DOUBLE) / CAST(nv AS DOUBLE) AS v_share,
        |  CAST(deg_mass AS DOUBLE) / CAST(m2 AS DOUBLE) AS mass_share
        |FROM spec CROSS JOIN tot
        |ORDER BY db""".stripMargin,

    "g01_triangle_count" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), deg AS (
        |  SELECT x, COUNT(*) AS deg
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x
        |), o AS (
        |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS a,
        |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS b
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |), wedge AS (
        |  SELECT e1.b AS x, e2.b AS y
        |  FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
        |), tri AS (
        |  SELECT COUNT(*) AS n_triangles FROM wedge JOIN e ON x = u AND y = v
        |), stats AS (
        |  SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
        |         (SELECT COUNT(*) FROM e) AS n_edges,
        |         (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges
        |)
        |SELECT n_vertices, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges = 0 THEN 0.0
        |       ELSE (n_triangles * 3)::DOUBLE / n_wedges::DOUBLE END AS clustering_coeff
        |FROM stats, tri""".stripMargin,

    "g02_pagerank_step" ->
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), deg AS (
         |  SELECT x, COUNT(*) AS deg
         |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
         |  GROUP BY x
         |), msgs AS (
         |  SELECT m.dst, $RankScale // d.deg AS contrib
         |  FROM (SELECT u AS src, v AS dst FROM e
         |        UNION ALL SELECT v AS src, u AS dst FROM e) m
         |  JOIN deg d ON d.x = m.src
         |)
         |SELECT dst AS part_id, COUNT(*) AS in_deg,
         |  CAST(SUM(contrib) AS BIGINT) AS rank_num
         |FROM msgs
         |GROUP BY dst
         |ORDER BY rank_num DESC, part_id ASC
         |LIMIT 25""".stripMargin,

    // the 8 damped rounds unrolled as generated MATERIALIZED layers
    // (g05's template): every vertex has deg ≥ 1 on an undirected edge
    // set, so each round's rank table covers all vertices and the
    // profile join is total; all sums CAST to BIGINT (HUGEINT widening)
    "g02b_pagerank_profile" -> {
      val base = RankScale * (DampDen - DampNum) / DampDen
      val layers = (1 to PageRankRounds).map { i =>
        s"""m$i AS MATERIALIZED (
           |  SELECT nb.dst AS x, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m
           |  FROM nb JOIN deg d ON d.x = nb.src JOIN r${i - 1} r ON r.x = nb.src
           |  GROUP BY nb.dst
           |), r$i AS MATERIALIZED (
           |  SELECT x, $base + m * $DampNum // $DampDen AS rank FROM m$i
           |), row$i AS MATERIALIZED (
           |  SELECT CAST($i AS BIGINT) AS round,
           |    CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) AS total_move,
           |    CAST(MAX(a.rank) AS BIGINT) AS max_rank,
           |    CAST(MIN(a.rank) AS BIGINT) AS min_rank,
           |    CAST(SUM(a.rank) AS BIGINT) AS rank_mass
           |  FROM r$i a JOIN r${i - 1} b USING (x)
           |)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to PageRankRounds).map(i => s"SELECT * FROM row$i")
        .mkString("\n|", "\n|UNION ALL ", "")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), deg AS MATERIALIZED (
         |  SELECT src AS x, COUNT(*) AS deg FROM nb GROUP BY src
         |), r0 AS MATERIALIZED (
         |  SELECT x, CAST($RankScale AS BIGINT) AS rank FROM deg
         |),
         |$layers
         |SELECT * FROM ($unionAll
         |) ORDER BY round""".stripMargin
    },

    // the walk UNIONs distinct (v, lvl) pairs with a depth cap, so it
    // terminates on cycles; MIN(lvl) per vertex = the BFS level whenever
    // the true level < cap (the Spark side throws past the same cap)
    "g03_bfs_levels" ->
      s"""WITH RECURSIVE li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), deg AS (
         |  SELECT src, COUNT(*) AS deg FROM nb GROUP BY src
         |), root AS (
         |  SELECT src FROM deg ORDER BY deg DESC, src ASC LIMIT 1
         |), walk AS (
         |  SELECT src AS v, 0 AS lvl FROM root
         |  UNION
         |  SELECT nb.dst, w.lvl + 1 FROM walk w JOIN nb ON nb.src = w.v
         |  WHERE w.lvl < $MaxBfsRounds
         |), lv AS (
         |  SELECT v, MIN(lvl) AS lvl FROM walk GROUP BY v
         |)
         |SELECT CAST(lvl AS BIGINT) AS level, COUNT(*) AS n_vertices,
         |  MIN(v) AS min_part, MAX(v) AS max_part
         |FROM lv GROUP BY lvl
         |ORDER BY level""".stripMargin,

    // common neighbors restated as the direct two-hop join (oracle-scale
    // only); jaccard = the same single division of exact BIGINTs
    "g04_edge_jaccard" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), nb AS (
        |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
        |), deg AS (
        |  SELECT src AS x, COUNT(*) AS deg FROM nb GROUP BY src
        |), t AS (
        |  SELECT e.u, e.v, COUNT(*) AS common
        |  FROM e
        |  JOIN nb n1 ON n1.src = e.u
        |  JOIN nb n2 ON n2.src = e.v AND n2.dst = n1.dst
        |  GROUP BY e.u, e.v
        |)
        |SELECT e.u, e.v, COALESCE(t.common, 0) AS common_nbrs,
        |  du.deg AS deg_u, dv.deg AS deg_v,
        |  COALESCE(t.common, 0)::DOUBLE
        |    / (du.deg + dv.deg - COALESCE(t.common, 0))::DOUBLE AS jaccard
        |FROM e
        |LEFT JOIN t ON t.u = e.u AND t.v = e.v
        |JOIN deg du ON du.x = e.u
        |JOIN deg dv ON dv.x = e.v
        |ORDER BY jaccard DESC, e.u ASC, e.v ASC
        |LIMIT 100""".stripMargin,

    // the peel unrolled to exactly MaxPeelRounds layers (generated, not
    // hand-copied) — both engines run the SAME fixed round count, with
    // converged rounds as explicit no-op rows, so the profiles align
    // row-for-row. AS MATERIALIZED on every per-layer CTE: DuckDB
    // inlines CTEs by default, and 12 layers each referencing the
    // previous one several times would otherwise expand the plan tree
    // exponentially (observed as a too-many-open-files blowup
    // re-scanning lineitem per leaf).
    "g05_kcore" -> {
      val layers = (1 to MaxPeelRounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT x, COUNT(*) AS c
           |  FROM (SELECT u AS x FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
           |  GROUP BY x
           |), r$i AS MATERIALIZED (
           |  SELECT x FROM d$i, kk WHERE c < kk.k
           |), e$i AS MATERIALIZED (
           |  SELECT u, v FROM e${i - 1}
           |  WHERE u NOT IN (SELECT x FROM r$i) AND v NOT IN (SELECT x FROM r$i)
           |), row$i AS MATERIALIZED (
           |  SELECT CAST($i AS BIGINT) AS round, kk.k AS k,
           |    (SELECT COUNT(*) FROM r$i) AS n_removed,
           |    (SELECT COUNT(DISTINCT x)
           |     FROM (SELECT u AS x FROM e$i UNION ALL SELECT v FROM e$i)) AS n_vertices,
           |    (SELECT COUNT(*) FROM e$i) AS n_edges
           |  FROM kk
           |)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to MaxPeelRounds).map(i => s"SELECT * FROM row$i").mkString("\n|", "\n|UNION ALL ", "")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), kk AS MATERIALIZED (
         |  SELECT 2 * (SELECT COUNT(*) FROM e0)
         |    // (SELECT COUNT(DISTINCT x)
         |        FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)) + 1 AS k
         |),
         |$layers
         |SELECT * FROM ($unionAll
         |) ORDER BY round""".stripMargin
    },

    // same directed endpoint list; DuckDB sums in HUGEINT and casts back
    // — the values themselves fit BIGINT, so both engines' doubles come
    // from identical integers
    "g06_assortativity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), nb AS (
        |  SELECT u AS i, v AS j FROM e UNION ALL SELECT v, u FROM e
        |), deg AS (
        |  SELECT i AS x, COUNT(*) AS deg FROM nb GROUP BY i
        |), d AS (
        |  SELECT di.deg AS dx, dj.deg AS dy
        |  FROM nb JOIN deg di ON di.x = nb.i JOIN deg dj ON dj.x = nb.j
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS m_directed,
        |  CAST(SUM(dx) AS BIGINT) AS sum_x,
        |  CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
        |  CAST(SUM(dx * dx) AS BIGINT) AS sum_x2,
        |  CASE WHEN COUNT(*) * SUM(dx * dx) = SUM(dx) * SUM(dx) THEN NULL
        |    ELSE (COUNT(*) * SUM(dx * dy) - SUM(dx) * SUM(dx))::DOUBLE
        |      / (COUNT(*) * SUM(dx * dx) - SUM(dx) * SUM(dx))::DOUBLE
        |  END AS assortativity
        |FROM d""".stripMargin,

    // g01's wedge-join triangle enumeration with the APEX KEPT, so each
    // triangle credits its three vertices once; the bucket floor is the
    // same integer cross-multiplication (2·t·10) // (deg·(deg−1))
    "g07_local_clustering" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), deg AS (
        |  SELECT x, COUNT(*) AS deg
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x
        |), o AS (
        |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS a,
        |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS b
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |), wedge AS (
        |  SELECT e1.a AS a, e1.b AS x, e2.b AS y
        |  FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
        |), tri AS (
        |  SELECT a, x, y FROM wedge JOIN e ON x = u AND y = v
        |), tv AS (
        |  SELECT z, COUNT(*) AS t
        |  FROM (SELECT a AS z FROM tri UNION ALL SELECT x FROM tri
        |        UNION ALL SELECT y FROM tri)
        |  GROUP BY z
        |), verts AS (
        |  SELECT d.deg, COALESCE(tv.t, 0) AS t
        |  FROM deg d LEFT JOIN tv ON tv.z = d.x
        |  WHERE d.deg >= 2
        |)
        |SELECT CAST((2 * t * 10) // (deg * (deg - 1)) AS BIGINT) AS cc_bucket,
        |  COUNT(*) AS n_vertices, CAST(SUM(t) AS BIGINT) AS sum_triangles
        |FROM verts
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // the 12 min-label rounds unrolled as generated MATERIALIZED layers
    // (g02b's template): neighbor labels + a flagged self row per vertex,
    // one MIN fold per layer; converged layers keep computing the same
    // fixed point the Spark side synthesizes job-free
    "g08_cc_profile" -> {
      val layers = (1 to CcRounds).map { i =>
        s"""l$i AS MATERIALIZED (
           |  SELECT dst AS x, MIN(slab) AS lab,
           |    MAX(CASE WHEN own = 1 THEN slab END) AS prev_lab
           |  FROM (SELECT nb.dst, l.lab AS slab, 0 AS own
           |        FROM nb JOIN l${i - 1} l ON l.x = nb.src
           |        UNION ALL SELECT x, lab, 1 FROM l${i - 1})
           |  GROUP BY dst
           |), row$i AS MATERIALIZED (
           |  SELECT CAST($i AS BIGINT) AS round,
           |    CAST(SUM(CASE WHEN lab <> prev_lab THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           |    CAST(COUNT(DISTINCT lab) AS BIGINT) AS n_labels,
           |    CAST(SUM(lab) AS BIGINT) AS label_sum
           |  FROM l$i
           |)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to CcRounds).map(i => s"SELECT * FROM row$i")
        .mkString("\n|", "\n|UNION ALL ", "")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |), nb AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
         |), l0 AS MATERIALIZED (
         |  SELECT src AS x, src AS lab FROM nb GROUP BY src
         |),
         |$layers
         |SELECT * FROM ($unionAll
         |) ORDER BY round""".stripMargin
    }
  )
}
