package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Curation, Dedup, Graph, Layout, Multimodal, Relational, Similarity, Skew, Temporal, TextAnalysis}
import graft.streaming.StreamingQueries

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` aggregates every module's catalog; `oracleSql` the matching
  * DuckDB statements (omitted for non-SQL-expressible / approximate ops,
  * which the driver then checks rows-only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The curation pipeline chains the engine's signature surface — text
    * quality/lang gates, exact dedup, MinHash-LSH near-dedup — in one
    * declarative plan (scan + window + hash-agg + band-join + anti-join).
    */
  def entry(spark: SparkSession): DataFrame =
    Curation.queries("p01_curation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Temporal.queries ++
      Skew.queries ++ Curation.queries ++ Graph.queries ++ Layout.queries ++
      StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ Temporal.oracles ++
      Skew.oracles ++ Curation.oracles ++ Graph.oracles ++ Layout.oracles ++
      StreamingQueries.oracles
}
