package graft

import java.nio.file.Files

/** Pins the toStorage scratch-dir bound: a long-lived session must hold at
  * most ONE live scratch dir per tag (round-5 verdict flagged unbounded
  * UUID-dir accumulation), and the newest invocation's frame must stay
  * readable after older scratches for the same tag are reaped.
  */
class MaterializeScratchSpec extends SparkSpec {

  test("repeated toStorage invocations leave at most one scratch dir per tag") {
    val s = spark
    import s.implicits._
    val scratch = Files.createTempDirectory("graft_scratch_spec").toString
    val old = s.conf.getOption("spark.graft.scratchDir")
    s.conf.set("spark.graft.scratchDir", scratch)
    try {
      var last: org.apache.spark.sql.DataFrame = null
      for (i <- 1 to 4)
        last = Materialize.toStorage(Seq((i, "x")).toDF("id", "v"), "spec_tag")
      val dirs = new java.io.File(scratch).listFiles().filter(_.getName.startsWith("spec_tag_"))
      assert(dirs.length == 1, s"expected 1 live scratch dir, found ${dirs.length}")
      assert(last.collect().map(_.getInt(0)).toSeq == Seq(4), "newest frame must stay readable")
    } finally {
      old match {
        case Some(v) => s.conf.set("spark.graft.scratchDir", v)
        case None    => s.conf.unset("spark.graft.scratchDir")
      }
    }
  }
}
