package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the g03 pipeline, local only. */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    t("li_distinct")(li.write.format("noop").mode("overwrite").save())
    val e = li.select(col("ok"), col("pk").as("u"))
      .join(li.select(col("ok"), col("pk").as("v")), "ok")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
    t("edges")(e.write.format("noop").mode("overwrite").save())
    println("EDGES=" + t("edges_count")(e.count()))
    val adj = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
      .groupBy("src").agg(collect_set(col("dst")).as("nbrs")).persist()
    println("VERTS=" + t("adj_build")(adj.count()))
    val root = t("root")(adj.orderBy(size(col("nbrs")).desc, col("src").asc)
      .limit(1).select("src").collect()(0).getLong(0))
    var visited = spark.range(1).select(lit(root).as("v"), lit(0L).as("lvl")).persist()
    var frontier = visited
    var lvl = 0L
    var done = false
    while (!done && lvl < 30) {
      val next = adj.join(frontier.select(col("v").as("src")), "src")
        .select(explode(col("nbrs")).as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .select(col("v"), lit(lvl + 1L).as("lvl")).persist()
      val n = t(s"round_$lvl")(next.count())
      println(s"  frontier_${lvl + 1} = $n")
      if (n == 0) done = true
      else {
        val nv = visited.unionAll(next).persist()
        t(s"union_$lvl")(nv.count())
        visited = nv; frontier = next; lvl += 1
      }
    }
    spark.stop()
  }
}
