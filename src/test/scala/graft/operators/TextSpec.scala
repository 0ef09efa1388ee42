package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import graft.functions.HashingFunctions._
import graft.functions.TextFunctions._

class TextSpec extends SparkSpec {

  test("rolling fingerprint: equal normalized text <=> equal fingerprint (on this corpus)") {
    import spark.implicits._
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    val d = Tables.documents(spark, sfDir)
      .select(norm.as("n"), rolling_fingerprint(norm).as("fp"))
    val groups = d.groupBy("fp").agg(countDistinct("n").as("texts")).collect()
    groups.foreach(r => assert(r.getLong(1) === 1L, "hash collision between distinct texts"))
    // and determinism
    val again = Tables.documents(spark, sfDir)
      .select(rolling_fingerprint(norm).as("fp")).as[Long].collect().sorted
    val first = d.select("fp").as[Long].collect().sorted
    assert(first.sameElements(again))
  }

  test("fingerprint of known strings matches the documented recurrence") {
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((f, b) => f * 1315423911L + (b & 0xFF))
    val inputs = Seq("", "a", "hello world", "the quick brown fox")
    val got = inputs.toDF("s").select(rolling_fingerprint(col("s"))).as[Long].collect()
    assert(got.toSeq === inputs.map(ref))
  }

  test("token counts agree with a driver-side tokenizer on sample docs") {
    val rows = Tables.documents(spark, sfDir).limit(20)
      .select(col("text"),
        tokenCountWs(col("text")).as("ws"),
        tokenCountBpe(col("text")).as("bpe"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val expectedWs = text.toLowerCase.split(" ").count(_.nonEmpty)
      val expectedBpe = BpeTokenPattern.r.findAllIn(text.toLowerCase).length
      assert(r.getLong(1) === expectedWs.toLong)
      assert(r.getLong(2) === expectedBpe.toLong)
    }
  }

  test("quality score stays in [0,1] and lang-id emits only known codes") {
    val q = TextAnalysis.queries("t02_quality_score")(spark, sfDir).collect()
    q.foreach { r =>
      val s = r.getDouble(4)
      assert(s >= 0.0 && s <= 1.0)
    }
    val langs = LangMarkers.map(_._1).toSet
    val preds = TextAnalysis.queries("t03_lang_id")(spark, sfDir)
      .select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(langs + "und"))
  }

  test("t06 hash split: deterministic, complete, disjoint, ~80/10/10") {
    val runs = (1 to 2).map(_ =>
      TextAnalysis.queries("t06_hash_split")(spark, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(runs(0) === runs(1), "identical assignment across runs")
    val total = runs(0).values.sum
    assert(total === graft.Tables.documents(spark, sfDir).count(), "complete partition")
    val trainFrac = runs(0)("train").toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac near 0.8")
  }

  test("word shingles: short docs yield empty arrays, not errors") {
    import spark.implicits._
    val got = Seq("one two", "a", "", "x y z w").toDF("text")
      .select(size(wordShingles(col("text"), 3)).as("n")).as[Int].collect()
    assert(got.toSeq === Seq(0, 0, 0, 2))
  }

  test("t08 mixture sampler: achieved rate tracks each source's target rate") {
    // the oracle pins exact parity; this pins the STATISTICAL claim — the
    // stateless id mix is uniform enough that every source's achieved
    // sampling rate lands near its target (binomial stderr at these
    // per-source counts is ~7-10 points; allow 3 sigma)
    val rows = TextAnalysis.queries("t08_mixture_sample")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val srcNum = "[0-9]+".r.findFirstIn(r.getString(0)).get.toLong
      val target = (30L + srcNum % 10 * 7L).toDouble / 100.0
      val achieved = r.getLong(2).toDouble / r.getLong(1)
      val sigma = math.sqrt(target * (1 - target) / r.getLong(1))
      assert(math.abs(achieved - target) <= 3 * sigma + 0.02,
        s"${r.getString(0)}: achieved $achieved vs target $target (n=${r.getLong(1)})")
    }
  }
}
