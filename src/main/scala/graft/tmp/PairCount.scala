package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.hyperplane_lsh_multi

/** Scratch diagnostic (delete after use): bucket-occupancy and candidate
  * -pair census for the LSH geometry at a given corpus.
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val bits = args(1).toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val ex = e.withColumn("buckets", hyperplane_lsh_multi(col("embedding"), bits, 48, 64, seed = 7L))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val sz = ex.groupBy("tbl", "bucket").agg(count(lit(1)).as("sz"))
    val stats = sz.agg(count(lit(1)).as("n_buckets"), max("sz").as("max_sz"),
      expr("percentile(sz, 0.5)").as("med_sz"),
      sum(col("sz") * col("sz")).as("pair_mass"),
      sum(when(col("sz") > 10000, col("sz") * col("sz"))).as("dropped_mass")).collect()(0)
    println(s"[paircount] n=$n bits=$bits buckets=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"med=${stats.getDouble(2)} pairMass=${stats.getLong(3)} droppedMass=${Option(stats.get(4)).getOrElse(0L)}")
    spark.stop()
  }
}
