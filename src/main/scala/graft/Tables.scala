package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All engine code reads tables through here so that scan-level concerns
  * (nanosecond-timestamp decoding, column naming) are handled exactly once.
  *
  * Scale notes (100 TB target): loaders return plain parquet scans — no
  * `.cache()`, no collect — so Catalyst keeps predicate pushdown / column
  * pruning / partition pruning on the scan. On a real cluster these paths
  * would be directories of many files; everything downstream only assumes
  * "a DataFrame with this schema".
  */
object Tables {

  /** events.ts is written as parquet INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a
    * microsecond timestamp. DuckDB (the oracle) reads the same value at
    * nanosecond precision; all query outputs therefore only expose
    * second-or-coarser derivations of `ts` (date_trunc, date_format), which
    * agree between the two engines.
    */
  def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events` with `ts` rebuilt as a TimestampType (µs) column.
    *
    * `div` (integral division) — not `/`, which on longs is DOUBLE division
    * and truncates ns epochs (~1.77e18 > 2^53) by up to 1µs.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    withNanosAsLong(spark)
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
