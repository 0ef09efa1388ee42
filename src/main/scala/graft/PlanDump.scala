package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: `.explain("formatted")` output for the flagship
  * queries, captured as a reviewable artifact. The living guarantees are
  * the plan assertions in PlanShapeSpec (and SimilaritySpec for e04b);
  * this dump is the human-readable evidence trail next to them.
  *
  * Regenerate (forked-run output is unprefixed since the round-7
  * outputStrategy fix; strip only the sbt trailer lines):
  *   sbt -batch "runMain graft.PlanDump" | sed -n '/^# PLANS/,$p' \
  *     | grep -v '^\[' > PLANS.md
  */
object PlanDump {

  val Flagships = Seq(
    "p01_curation_pipeline" -> "the composed curation pipeline (filters -> exact dedup -> LSH near-dedup)",
    "d03_minhash_lsh" -> "MinHash+LSH near-dup pairs (band join, capped buckets, exact verify)",
    "e04b_embedding_nn_dedup_lsh" -> "NN-for-all via LSH candidates (the no-quadratic-join plan)",
    "t13_bloom_decontaminate" -> "bloom-prefiltered decontamination (might_contain before the join)",
    "q01_agg_pricing_summary" -> "TPC-H Q1 shape (pushdown, pruning, two-phase agg)",
    "e08_kmeans_step" -> "k-means Lloyd step (broadcast centroids, order-pinned recompute)",
    "q43_lateral_topk" -> "LATERAL top-3-per-customer (decorrelated to WindowGroupLimit rank pushdown)",
    "g01_triangle_count" -> "degree-oriented triangle counting (equi-join wedges, no nested loop)",
    "a09_interval_concurrency" -> "sweep-line concurrency (two-phase prefix sum, broadcast carry offsets)",
    "e10_ivf_pq_ann" -> "IVF-PQ ADC search (broadcast codebook, cell-join candidates, shortlist re-rank)",
    "d10_containment" -> "asymmetric containment (df-capped rare-shingle equi-join, no quadratic operator)",
    "t18_boilerplate_spans" -> "boilerplate-span filter (span-df join on the span key, broadcast corpus count)",
    "t19_heavy_hitters" -> "CMS heavy hitters (scan-level sketch probe BEFORE the exact count's shuffle)",
    "m09_phash_neardup" -> "perceptual-hash near-dup (codegen'd band sums, pigeonhole equi-join, no quadratic operator)",
    "q52_sketch_union" -> "mergeable HLL cardinality (partial sketch agg map-side; only fixed-size binaries shuffle)",
    "d12_substring_dup_mass" -> "substring dup mass (windows leave the scan as 64-bit hashes; hash-keyed frequency join)",
    "e11_semdedup" -> "semantic dedup (broadcast centroid assignment, cell-keyed pair join, no cartesian)",
    "k03_hot_key_isolation" -> "hot-key isolation join (count-first routing; broadcast hot slice union shuffle cold)",
    "e12_hybrid_rrf" -> "hybrid RRF retrieval (two TakeOrdered channels, integer rank fusion, top-10)",
    "g04_edge_jaccard" -> "edge neighborhood jaccard (oriented sorted-merge intersect, per-triangle credit rows)",
    "p05_dedup_report" -> "dedup report (ONE text scan feeds a stored hash table; the rollups scan 8-byte hashes only)",
    "p07_release_manifest" -> "release manifest (five gates, one scoring scan, banded near-dup, hash-keyed contamination)",
    "e12b_hybrid_rrf_indexed" -> "indexed hybrid retrieval (posting-list probe + IVF shortlist; no corpus scan per channel)",
    "e16_coverage_select" -> "greedy max-coverage selection (scratch candidate scan, 5 unrolled argmax layers)",
    "t28_bpe_apply" -> "BPE apply audit (one corpus scan into the vocabulary; winner + replace run vocab-sized)",
    "p08_source_cap_sample" -> "source-capped sample (hash-threshold scan predicate, broadcast source dim, no sort)",
    "t30_bigram_surprisal" -> "bigram surprisal (map-side-combined freq aggs, hash join back on the bigram key)",
    "g07_local_clustering" -> "local clustering histogram (shared oriented intersect, 3 vertex credits per triangle)",
    "d13_cross_source_dup_matrix" -> "cross-source dup matrix (8-byte fingerprint self-join, broadcast size dims)",
    "e17_ivf_balance" -> "IVF balance audit (broadcast centroids, two hash aggs, one output row)",
    "z06_bloom_skipping" -> "bloom skipping audit (hash once per distinct key, bit-keyed joins, metadata-sized manifest)",
    "t32_source_divergence" -> "source divergence (decomposed TV sum: one vocab-keyed pair join, decimal products)",
    "e19_ivf_probe_sweep" -> "IVF probe sweep (one shared candidate generation; the three sweeps are filters over it)",
    "m13_multimodal_pack" -> "multimodal packing (one scan, source-partitioned prefix-sum window, integer costs)",
    "e21_ivf_subcell_sweep" -> "derived-sub-cell IVF sweep ((cell, sub)-keyed candidate join, Hamming-1 probe explode)",
    "e18b_nn_descent_converge" -> "two-round NN-descent (scratch-scan carry between rounds, bounded top-k agg)",
    "d16_minhash_calibration" -> "minhash calibration (count-first capped buckets, signature zip agree, fixed-point exact side)",
    "e22_sq_rerank" -> "SQ8 scan + re-rank (integer-dot shortlist window, 40-row exact cosine re-rank)")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("# PLANS -- formatted physical plans of the flagship queries")
    println()
    println(s"Generated by `graft.PlanDump` at $sfDir (see its scaladoc for the")
    println("regeneration command). The machine-checked versions of these")
    println("properties live in `PlanShapeSpec` (and `SimilaritySpec` for e04b);")
    println("this file is the human-readable evidence (scan pushdown, broadcast")
    println("choices, agg phases, generate/window placement) for review.")
    for ((name, blurb) <- Flagships) {
      println()
      println(s"## $name -- $blurb")
      println()
      println("```")
      // queryExecution.explainString gives the formatted plan as a string
      val df = SparkEntry.queries(name)(spark, sfDir)
      print(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println("```")
    }
    spark.stop()
  }
}
