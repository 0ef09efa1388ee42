package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("m01 oracle precondition: fixture documents are pure ASCII") {
    // The DuckDB oracle sums ascii(text[i]) over CHARACTERS while Spark
    // sums UTF-8 BYTES; the two agree only for ASCII text. Pin the fixture
    // assumption so a future non-ASCII fixture fails loudly here instead of
    // silently diverging in the driver check.
    val nonAscii = Tables.documents(spark, sfDir)
      .where(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii === 0L, "m01 oracle assumes ASCII-only documents")
  }

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
      Seq("doc_id", "n_bytes", "width", "height", "n_channels", "frame_offsets_csv"))
    val c1 = df1.collect(); val c2 = df2.collect()
    assert(c1.map(_.toString).toSeq === c2.map(_.toString).toSeq)
    assert(c1.length === Tables.documents(spark, sfDir).count())
    c1.foreach { r =>
      assert(r.getInt(2) >= 64 && r.getInt(2) < 1088) // stub width range
      val offs = r.getString(5).split(",").map(_.toLong).toSeq
      assert(offs.length === 4)                       // 4 sampled frames
      assert(offs.forall(o => o >= 0 && o < math.max(r.getLong(1), 1L)))
    }
  }

  test("m03 resize plan: aspect preserved, bounded to maxSide, deterministic") {
    val rows = Multimodal.queries("m03_resize_plan")(spark, sfDir).collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (sw, sh, dw, dh, scale) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))
      assert(math.max(dw, dh) <= 256, "longest side fits the target")
      assert(scale <= 1.0 && scale > 0.0)
      if (scale < 1.0) {
        // geometry follows the documented recipe exactly (aspect preserved
        // up to per-axis rounding)
        assert(dw === math.max(1, math.round(sw * scale).toInt))
        assert(dh === math.max(1, math.round(sh * scale).toInt))
        assert(scale === 256.0 / math.max(sw, sh))
      } else assert(dw === sw && dh === sh)
      assert(r.getLong(6) === dw.toLong * dh * 3, "bytes = w*h*channels")
    }
  }

  test("m08 scene stats: crafted payloads hit the closed-form cuts") {
    import Multimodal.{Blob, FrameStride}
    // two homogeneous 2-frame segments: 'a'×128 then 'z'×128 — exactly one
    // cut at the segment boundary (frame 2), delta = 64 × ('z' − 'a')
    val twoScene = Multimodal.sceneStats(
      Blob(1L, Array.fill(2 * FrameStride)('a'.toByte) ++ Array.fill(2 * FrameStride)('z'.toByte)))
    assert(twoScene.n_frames === 4)
    assert(twoScene.n_cuts === 1L)
    assert(twoScene.first_cut_frame === 2L)
    assert(twoScene.max_delta === FrameStride.toLong * ('z' - 'a'))

    // homogeneous payload: no cut ever, max_delta only from the ragged tail
    val flat = Multimodal.sceneStats(Blob(2L, Array.fill(3 * FrameStride)('m'.toByte)))
    assert(flat.n_cuts === 0L && flat.first_cut_frame === -1L && flat.max_delta === 0L)

    // ragged tail below threshold: the short last frame's delta counts
    // toward max_delta but (here) not a cut
    val ragged = Multimodal.sceneStats(Blob(3L, Array.fill(FrameStride + 2)('m'.toByte)))
    assert(ragged.n_frames === 2)
    assert(ragged.max_delta === ('m'.toInt.toLong * (FrameStride - 2)))
    assert(ragged.n_cuts === (if ('m'.toInt.toLong * (FrameStride - 2) > Multimodal.CutThreshold) 1L else 0L))

    // sub-frame payload: one frame, no deltas at all
    val tiny = Multimodal.sceneStats(Blob(4L, Array.fill(5)('x'.toByte)))
    assert(tiny.n_frames === 1 && tiny.n_cuts === 0L && tiny.max_delta === 0L)
  }

  test("m10 shots: crafted payloads segment at cuts; keyframe is max-sig earliest-tie") {
    import Multimodal.{Blob, FrameStride, ShotRow}
    // two 'a' frames then two 'z' frames: one cut at frame 2 ⇒ two shots.
    // Within each shot the two frames tie on signature ⇒ keyframe = the
    // EARLIER frame of the tie.
    val aSig = 'a'.toLong * FrameStride
    val zSig = 'z'.toLong * FrameStride
    val two = Multimodal.shotRows(
      Blob(1L, Array.fill(2 * FrameStride)('a'.toByte) ++ Array.fill(2 * FrameStride)('z'.toByte)))
    assert(two === Seq(
      ShotRow(1L, 0L, 0L, 2L, 0L, aSig, 2 * aSig),
      ShotRow(1L, 1L, 2L, 2L, 2L, zSig, 2 * zSig)))

    // homogeneous payload: a single shot spanning every frame
    val flat = Multimodal.shotRows(Blob(2L, Array.fill(3 * FrameStride)('m'.toByte)))
    val mSig = 'm'.toLong * FrameStride
    assert(flat === Seq(ShotRow(2L, 0L, 0L, 3L, 0L, mSig, 3 * mSig)))

    // ragged tail that triggers a cut: the short last frame starts its
    // own shot and is its own keyframe, and the frame census conserves
    val cutTail = Multimodal.shotRows(Blob(3L, Array.fill(FrameStride + 1)('z'.toByte)))
    if ('z'.toLong * (FrameStride - 1) > Multimodal.CutThreshold) {
      assert(cutTail.length === 2)
      assert(cutTail(1) === ShotRow(3L, 1L, 1L, 1L, 1L, 'z'.toLong, 'z'.toLong))
    }
    assert(cutTail.map(_.n_frames).sum === 2L)

    // empty-adjacent edge: a sub-frame payload is one one-frame shot
    val tiny = Multimodal.shotRows(Blob(4L, Array.fill(5)('x'.toByte)))
    assert(tiny === Seq(ShotRow(4L, 0L, 0L, 1L, 0L, 5L * 'x'.toLong, 5L * 'x'.toLong)))
  }

  test("m09 phash: crafted probe flips give exact distances; >HamMax rejected; short docs excluded") {
    import spark.implicits._
    import Multimodal.{PhashMinLen, PhashStride}
    // probe i sits at 0-based byte i·stride; every non-probe byte is 'm'.
    // Base gradient: probes alternate b,a,b,a,… ⇒ bit i = 1 iff i even.
    // Changing probe 0 touches only bit 0 (there is no bit −1).
    def mk(probe: Int => Char): String = {
      val arr = Array.fill(PhashMinLen)('m')
      var p = 0
      while (p < arr.length) { arr(p) = probe(p / PhashStride); p += PhashStride }
      new String(arr)
    }
    val base: Int => Char = i => if (i % 2 == 0) 'b' else 'a'
    val d1 = mk(base)
    val d2 = mk(i => if (i == 0) 'a' else base(i))        // flips bit 0 only
    // probes 0..9 flattened to 'a' zeroes bits 0,2,4,6,8 — five flips, all
    // inside band 0, so bands 1–3 still collide: a CANDIDATE pair that the
    // exact Hamming check must reject (dist 5 > 3)
    val d3 = mk(i => if (i <= 9) 'a' else base(i))
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d1), (5L, "x" * 100))
      .toDF("doc_id", "text")
    val got = Multimodal.phashPairs(docs).orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // (1,4) exact dup at dist 0; (1,2) and (2,4) one-bit flips; (·,3)
    // rejected by distance, (·,5) excluded by length
    assert(got === Seq((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)))
  }

  test("m14 margin: distance spectrum over candidates with exact probe agreement, incl. past the cut") {
    import spark.implicits._
    import Multimodal.{PhashMinLen, PhashStride}
    def mk(probe: Int => Char): String = {
      val arr = Array.fill(PhashMinLen)('m')
      var p = 0
      while (p < arr.length) { arr(p) = probe(p / PhashStride); p += PhashStride }
      new String(arr)
    }
    val base: Int => Char = i => if (i % 2 == 0) 'b' else 'a'
    val d1 = mk(base)
    val d2 = mk(i => if (i == 0) 'a' else base(i))        // 1 probe off, 1 bit
    val d3 = mk(i => if (i <= 9) 'a' else base(i))        // 5 probes off, 5 bits
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d1), (5L, "x" * 100))
      .toDF("doc_id", "text")
    // pairs: (1,4) d0/agr65 · (1,2),(2,4) d1/agr64 · (2,3) d4/agr61 ·
    // (1,3),(3,4) d5/agr60 — the d4/d5 rows sit PAST PhashHamMax and are
    // exactly what m09 hides and m14 reports
    val got = Multimodal.phashMargin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 1L, 65.0 / 1.0 / 65.0, 65L),
      (1L, 2L, 0L, 128.0 / 2.0 / 65.0, 64L),
      (4L, 1L, 0L, 61.0 / 1.0 / 65.0, 61L),
      (5L, 2L, 0L, 120.0 / 2.0 / 65.0, 60L)))
  }

  test("m11 trim geometry: relative gate cuts the quiet edges, keeps interior pauses") {
    import Multimodal.{trimOf, AudioFrameSamples, Blob}
    val chars = 2 * AudioFrameSamples // one frame = 256 samples = 512 bytes
    def payload(frames: String): Array[Byte] =
      frames.flatMap(c => (if (c == 'q') " " else "~") * chars).getBytes("US-ASCII")
    def frameEnergy(c: Char): Long = {
      val b = (if (c == 'q') ' ' else '~').toInt.toLong
      val smp = b | (b << 8)
      AudioFrameSamples.toLong * smp * smp
    }
    val eq = frameEnergy('q'); val el = frameEnergy('l')
    assert(eq * 4 < el, "fixture must make quiet frames fail the relative gate")
    // quiet lead-in and lead-out trimmed; the interior pause stays
    val t1 = trimOf(Blob(1L, payload("qllqlq")))
    assert((t1.first_loud, t1.last_loud, t1.kept_frames, t1.trimmed_frames) === ((1L, 4L, 4L, 2L)))
    assert(t1.kept_energy === 3 * el + eq)
    // all-loud: nothing trimmed; single frame: it is its own peak
    val t2 = trimOf(Blob(2L, payload("lll")))
    assert((t2.first_loud, t2.last_loud, t2.trimmed_frames) === ((0L, 2L, 0L)))
    val t3 = trimOf(Blob(3L, payload("q")))
    assert((t3.first_loud, t3.last_loud, t3.kept_frames) === ((0L, 0L, 1L)))
  }

  test("m12 shot-sig pairs: twins 1.0, sub-threshold excluded, df cap silences boilerplate") {
    import spark.implicits._
    def pairs(sigs: Seq[(Long, Long)]) =
      Multimodal.shotSigPairs(sigs.toDF("doc_id", "key_sig"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(5)))).toMap
    // docs 1,2 share both sigs (jacc 1.0); doc 3 shares 1 of its 2 with
    // doc 1 (jacc 1/3 < 1/2 — excluded); doc 4 disjoint
    val base = pairs(Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 99L), (4L, 50L), (4L, 51L)))
    assert(base.keySet === Set((1L, 2L)))
    assert(base((1L, 2L)) === ((2L, 1.0)))
    // exactly half shared: |A|=|B|=2, shared=1 → jacc 1/3 excluded;
    // shared=2 of 3 → 2/(3+3-2)=0.5 included (the 3·shared ≥ |A|+|B| edge)
    val edge = pairs(Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L), (2L, 13L)))
    assert(edge.keySet === Set((1L, 2L)) && edge((1L, 2L)) === ((2L, 0.5)))
    // a signature in 66 > ShotSigDfCap docs is dropped count-first: the
    // 66 docs have empty capped sets → zero pairs (no explosion)
    val boiler = pairs((1L to 66L).map(d => (d, 777L)))
    assert(boiler.isEmpty, "df-capped signature must not pair the corpus")
  }

  test("m13 pack closed form: two-modality costs, ceil patches, cross-budget straddle") {
    import spark.implicits._
    // patchBytes=4, budget=8.
    // doc 1 (s1 "aa bb"):     txt 2, bytes 5 → ⌈5/4⌉=2, cost 4, cum 4 → seq 0 only
    // doc 2 (s1 "cccc cccc"): txt 2, bytes 9 → 3, cost 5, cum 9 → straddles seqs 0-1
    // doc 3 (s2 ""):          cost 0 → dropped
    // doc 4 (s2 "x"):         txt 1, bytes 1 → 1, cost 2, cum 2 → seq 0
    val docs = Seq(
      (1L, "s1", "aa bb"), (2L, "s1", "cccc cccc"),
      (3L, "s2", ""), (4L, "s2", "x")
    ).toDF("doc_id", "source", "text")
    val got = Multimodal.multimodalPack(docs, 4, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got === Array(
      (1L, "s1", 2L, 2L, 4L, 0L, 0L, 0L, 1L),
      (2L, "s1", 2L, 3L, 5L, 4L, 0L, 1L, 2L),
      (4L, "s2", 1L, 1L, 2L, 0L, 0L, 0L, 1L)))
  }

  test("m02 decode runs as a narrow map (no shuffle in the plan before the final sort)") {
    val plan = Multimodal.queries("m02_fake_decode")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly one exchange — the one introduced by the deterministic ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"decode should not shuffle; plan:\n$plan")
  }

  test("m15 audio fingerprint: copies at distance 0, one-frame edit at distance 1, alternating pattern unreachable, short docs excluded") {
    import spark.implicits._
    // frame = 4 samples = 8 chars; 33 frames = 264 chars exactly
    val flat = "a" * 264                       // all energies equal -> all bits 0
    val alt = (0 to 32).map(f => if (f % 2 == 0) "z" * 8 else "a" * 8).mkString
    val altEdit = "a" * 8 + alt.substring(8)   // frame 0 high->low: flips bit 0 only
    val docs = Seq(
      (1L, flat), (2L, flat), (3L, alt), (4L, altEdit),
      (5L, "a" * 263)                          // one char short: excluded
    ).toDF("doc_id", "text")
    val got = Multimodal.audioFpPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2): identical -> 0. (3,4): one gradient bit flipped -> 1.
    // alt vs flat: 16 bits apart -> absent. doc 5 never hashes.
    assert(got === Set((1L, 2L, 0L), (3L, 4L, 1L)))
  }
}
