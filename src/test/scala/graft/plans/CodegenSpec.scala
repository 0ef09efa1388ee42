package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.HashingFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Evidence that the custom expressions participate in whole-stage codegen
  * — the "functions, not UDFs" design position made checkable. A UDF (or a
  * CodegenFallback expression) would appear OUTSIDE WholeStageCodegen
  * spans and break the fused pipeline exactly where the per-row work is
  * hottest.
  */
class CodegenSpec extends SparkSpec {

  private def codegenPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("custom scalar expressions evaluate inside WholeStageCodegen spans") {
    val d = Tables.documents(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val plans = Seq(
      codegenPlan(d.select(rolling_fingerprint(col("text")).as("fp"))),
      codegenPlan(d.select(minhash_signature(wordShingles(col("text"), 3), 16).as("sig"))),
      codegenPlan(d.select(simhash64(wordShingles(col("text"), 3)).as("h"))),
      codegenPlan(e.select(cosine_similarity(col("embedding"), col("embedding")).as("c"))),
      codegenPlan(e.select(hyperplane_lsh_multi(col("embedding"), 4, 2, 64, 7L).as("b"))),
      codegenPlan(d.select(charHistogram(col("text"), 16).as("hist"))))
    plans.foreach { p =>
      // "*(n)" prefixes mark operators fused into a whole-stage-codegen
      // stage; the Project carrying the custom expression must be starred,
      // not a standalone interpreted Project
      assert(!p.contains("CodegenFallback"), s"codegen fallback leaked into:\n$p")
      assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
        s"projection not fused into codegen:\n$p")
    }
  }

  test("codegen and interpreted paths agree for every custom expression") {
    val d = Tables.documents(spark, sfDir).limit(50)
    def snapshot() = d.select(col("doc_id"),
        rolling_fingerprint(col("text")).as("fp"),
        simhash64(wordShingles(col("text"), 3)).as("sh"),
        charHistogram(col("text"), 16).as("hist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3))).toSet
    val viaCodegen = snapshot()
    // spark.sql.codegen.wholeStage=false forces the eval path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaEval = snapshot()
      assert(viaCodegen === viaEval, "doGenCode and nullSafeEval must agree")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("sorted_intersect: codegen'd, agrees with eval and with array_intersect") {
    import graft.functions.ArrayFunctions.sorted_intersect
    import spark.implicits._
    val pairs = (1 to 200).map { i =>
      val a = (0L until 40L).filter(v => (v * 7919 + i) % 3 != 0).toArray.sorted
      val b = (0L until 40L).filter(v => (v * 104729 + i) % 4 != 0).toArray.sorted
      (a, b)
    }.toDF("a", "b")
    val p = codegenPlan(pairs.select(sorted_intersect(col("a"), col("b")).as("x")))
    assert(!p.contains("CodegenFallback"), s"codegen fallback leaked into:\n$p")
    def snap() = pairs.select(sorted_intersect(col("a"), col("b")).as("x"),
        array_intersect(col("a"), col("b")).as("y"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    val viaCodegen = snap()
    viaCodegen.foreach { case (x, y) =>
      assert(x === y.sorted, "merge result must equal array_intersect on sorted-unique input")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(snap().map(_._1) === viaCodegen.map(_._1), "doGenCode and nullSafeEval must agree")
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("cms probe is codegen'd and its codegen/eval paths agree") {
    val d = Tables.documents(spark, sfDir)
      .select(xxhash64(col("text")).as("h"))
    val cms = d.agg(cms_sketch_agg(col("h"), 0.001, 0.99, 7).as("c"))
      .head().getAs[Array[Byte]](0)
    val probed = d.select(col("h"), cms_min_count(cms, col("h")).as("est"))
    val plan = codegenPlan(probed)
    assert(!plan.contains("CodegenFallback"), s"cms probe fell back:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"cms probe not fused into codegen:\n$plan")
    val viaCodegen = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaEval = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaCodegen === viaEval, "cms estimate must not depend on the eval path")
      // and the estimates are usable: every present key estimates >= 1
      assert(viaEval.forall(_._2 >= 1L))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
