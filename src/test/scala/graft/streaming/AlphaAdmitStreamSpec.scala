package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s26's contract: the streamed admission is p12's plan ENFORCED — a
  * full-rate source (rate_ppm = 10⁶) streams through whole, a
  * throttled source admits a strict subset, and corpus-wide the
  * admitted token mass tracks the planned mass (the hash threshold is
  * an unbiased per-doc Bernoulli at rate ppm/10⁶, so the realized mass
  * concentrates around the plan — asserted with a generous band, since
  * per-doc token weights skew the variance).
  */
class AlphaAdmitStreamSpec extends SparkSpec {

  test("s26: full-rate sources stream whole; throttled sources subset; mass tracks plan") {
    val plan = graft.operators.Curation.queries("p12_alpha_mixture")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap // n_tokens, planned, ppm
    val got = StreamingQueries.queries("s26_stream_alpha_admit")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap // ppm, n_admitted, admitted
    assert(got.nonEmpty)
    got.foreach { case (src, (ppm, _, admitted)) =>
      val (nTok, _, planPpm) = plan(src)
      assert(ppm === planPpm, s"$src: reported rate must be the plan's")
      if (ppm == 1000000L)
        assert(admitted === nTok, s"$src at full rate must admit every token")
      else
        assert(admitted > 0L && admitted < nTok,
          s"$src throttled at $ppm ppm must admit a strict nonempty subset")
    }
    val planned = plan.values.map(_._2).sum.toDouble
    val realized = got.values.map(_._3).sum.toDouble
    assert(math.abs(realized - planned) / planned < 0.5,
      s"admitted mass $realized must track planned $planned")
  }
}
