package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** events.ts has shipped in two physical encodings across testdata
    * generations: parquet INT64 TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long via
    * `spark.sql.legacy.parquet.nanosAsLong` — and plain `timestamp[us]`
    * (isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ. A real
    * engine reads the footer and adapts; hard-coding either encoding is how
    * a testdata regeneration silently kills every event-time query. The
    * conf is harmless for non-NANOS files, so we always set it and then
    * branch on the type the scan actually produced ([[adaptiveTs]]).
    */
  def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Schema-adaptive rebuild of `ts` into a session-TZ TimestampType (µs)
    * column — the one shape all downstream operators assume.
    *
    *  - LongType (nanos-as-long): `div 1000` → µs. `div` (integral), not
    *    `/`, which on longs is DOUBLE division and truncates ns epochs
    *    (~1.77e18 > 2^53) by up to 1µs.
    *  - TIMESTAMP_NTZ (`timestamp[us]` parquet): cast to TimestampType;
    *    the session TZ is pinned to UTC by every entrypoint, so the cast
    *    is value-preserving and matches DuckDB's read of the same file.
    *  - TimestampType: already the target shape.
    *
    * Anything else fails loud — an unknown third encoding must not
    * silently produce shifted timestamps.
    */
  def adaptiveTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other =>
      throw new IllegalStateException(
        s"events.ts has unsupported parquet-decoded type $other; " +
          "expected INT64 nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
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

  /** `events` with `ts` rebuilt as a TimestampType (µs) column, whatever
    * physical encoding the current testdata generation used ([[adaptiveTs]]).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    withNanosAsLong(spark)
    adaptiveTs(read(spark, dir, "events"))
  }
}
