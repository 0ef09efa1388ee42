package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("m01 blob stats match driver-side byte math") {
    val got = Multimodal.queries("m01_blob_stats")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        r.getLong(0) -> (bytes.length.toLong, bytes.map(_ & 0xFF).map(_.toLong).sum)
      }.toMap
    assert(got === expected)
  }

  test("m02 fake decode is deterministic, schema-complete, one row per doc") {
    val df1 = Multimodal.queries("m02_fake_decode")(spark, sfDir)
    val df2 = Multimodal.queries("m02_fake_decode")(spark, sfDir)
    assert(df1.schema.fieldNames.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "n_channels", "frame_offsets"))
    val c1 = df1.collect(); val c2 = df2.collect()
    assert(c1.map(_.toString).toSeq === c2.map(_.toString).toSeq)
    assert(c1.length === Tables.documents(spark, sfDir).count())
    c1.foreach { r =>
      assert(r.getInt(2) >= 64 && r.getInt(2) < 1088) // stub width range
      assert(r.getSeq[Long](5).length === 4)          // 4 sampled frames
      val offs = r.getSeq[Long](5)
      assert(offs.forall(o => o >= 0 && o < math.max(r.getLong(1), 1L)))
    }
  }

  test("m02 decode runs as a narrow map (no shuffle in the plan before the final sort)") {
    val plan = Multimodal.queries("m02_fake_decode")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly one exchange — the one introduced by the deterministic ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"decode should not shuffle; plan:\n$plan")
  }
}
