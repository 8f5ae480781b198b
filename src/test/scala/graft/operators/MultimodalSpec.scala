package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class MultimodalSpec extends GraftSparkSpec {

  private lazy val media = {
    val s = spark
    import s.implicits._
    Multimodal.syntheticMedia(
      Seq((0L, "abcd"), (1L, "zzzzzzzz"), (2L, "a")).toDF("doc_id", "text"))
  }

  test("synthetic media: binary payload bytes and rotating mime") {
    val rows = media.orderBy("doc_id").collect()
    assert(rows(0).getAs[Array[Byte]]("bytes").toSeq === "abcd".getBytes("UTF-8").toSeq)
    assert(rows.map(_.getString(2)).toSeq ===
      Seq("image/png", "audio/wav", "video/mp4"))
  }

  test("stub decode: deterministic byte stats through mapPartitions") {
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).n_bytes === 4)
    assert(f(0).mean_byte === ('a' + 'b' + 'c' + 'd').toDouble / 4)
    assert(f(0).entropy === 2.0) // 4 distinct bytes, uniform
    assert(f(1).entropy === 0.0) // single repeated byte
    assert(f(1).mean_byte === 'z'.toDouble)
    // repeatable
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.toSeq === f.toSeq)
  }

  test("frame offsets: evenly spaced, capped, degenerate-safe") {
    assert(Multimodal.frameOffsets(640, 64, 100) === (0 until 10).map(_ * 64))
    assert(Multimodal.frameOffsets(640, 64, 4).length === 4)
    assert(Multimodal.frameOffsets(10, 64, 4) === Seq(0))
    assert(Multimodal.frameOffsets(0, 64, 4) === Seq.empty)
  }

  test("real PNG roundtrip: decoded raster stats equal the synthesis rule") {
    val s = spark
    import s.implicits._
    // "ab" → nb=2, w=3, h=1: pixels (a,b,a); "x"*20 → w=5, h=2
    val docs = Seq((0L, "ab"), (1L, "x" * 20), (2L, "")).toDF("doc_id", "text")
    val stats = Multimodal.decodeImageStats(Multimodal.encodeImages(docs))
      .collect().sortBy(_.doc_id)
    assert(stats.length === 2) // empty doc filtered, never a 0-px raster
    val a = stats(0)
    assert((a.width, a.height, a.n_pixels) === (3, 1, 3))
    assert(a.px_sum === 'a'.toLong * 2 + 'b'.toLong)
    assert(a.n_distinct_px === 2)
    assert(a.mean_px === a.px_sum.toDouble / 3)
    val b = stats(1)
    assert((b.width, b.height, b.n_pixels) === (5, 2, 10))
    assert(b.px_sum === 'x'.toLong * 10)
    assert(b.n_distinct_px === 1)
  }

  test("histogram audit: bins, mode, and chi-square numerator by hand") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "ab"), (1L, "x" * 20), (2L, ""))
      .toDF("doc_id", "text")
    val hist = Multimodal.decodeHistogram(Multimodal.encodeImages(docs))
      .collect().sortBy(_.doc_id)
    assert(hist.length === 2)
    // "ab" → 3×1 raster [97, 98, 97]: all in bin 6 (97>>4 = 98>>4 = 6)
    val a = hist(0)
    assert((a.n_pixels, a.n_bins_hit, a.mode_bin) === (3, 1, 6))
    assert(a.chi2_num === (16L * 3 - 3) * (16L * 3 - 3) + 15L * 3 * 3)
    // "x"*20 → 5×2 raster of 120s: bin 7, maximal concentration
    val b = hist(1)
    assert((b.n_pixels, b.n_bins_hit, b.mode_bin) === (10, 1, 7))
    assert(b.chi2_num === (16L * 10 - 10) * (16L * 10 - 10) + 15L * 10 * 10)
  }

  test("resize grid: floor box partition and integer means by hand") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "ab"), (1L, "x" * 20)).toDF("doc_id", "text")
    val cells = Multimodal.resizeGrid(Multimodal.encodeImages(docs))
      .collect().sortBy(c => (c.doc_id, c.cell))
    // "ab" → 3×1 raster [97, 98, 97]; tx = 4x DIV 3 → cells 0,1,2 (1 px each)
    val a = cells.filter(_.doc_id == 0L)
    assert(a.map(c => (c.cell, c.n_px, c.mean_micros)).toSeq ===
      Seq((0, 1L, 97000000L), (1, 1L, 98000000L), (2, 1L, 97000000L)))
    // "x"*20 → 5×2 raster of 120s; rows map to ty∈{0,2}, x to tx 0,0,1,2,3
    val b = cells.filter(_.doc_id == 1L)
    assert(b.map(c => (c.cell, c.n_px)).toSeq ===
      Seq((0, 2L), (1, 1L), (2, 1L), (3, 1L),
        (8, 2L), (9, 1L), (10, 1L), (11, 1L)))
    assert(b.forall(_.mean_micros === 120000000L))
  }

  test("real JPEG roundtrip: dims exact, decode deterministic, loss bounded") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "ab"), (1L, "x" * 20), (2L, ""),
      (3L, "The quick brown fox jumps over the lazy dog 0123456789"))
      .toDF("doc_id", "text")
    val stats = Multimodal.jpegRoundtrip(docs).collect().sortBy(_.doc_id)
    assert(stats.length === 3) // empty doc filtered
    // dimensions survive lossy compression EXACTLY (read from the
    // decoded image, so this also proves the parse ran)
    assert((stats(0).width, stats(0).height) === (3, 1))
    assert((stats(1).width, stats(1).height) === (5, 2))
    stats.foreach { st =>
      assert(st.n_pixels === st.width * st.height)
      assert(st.redecode_identical, s"doc ${st.doc_id}: nondeterministic decode")
      // stated tolerance: JDK JPEG at quality 0.9 on 8-bit grayscale —
      // per-pixel error under half the dynamic range, mean under 1/8th
      assert(st.max_abs_err <= 128,
        s"doc ${st.doc_id}: max_abs_err ${st.max_abs_err}")
      assert(st.err_sum.toDouble / st.n_pixels <= 32.0,
        s"doc ${st.doc_id}: mean err ${st.err_sum.toDouble / st.n_pixels}")
    }
    // a constant image compresses losslessly even through JPEG's DCT:
    // doc 1 is all 'x' — zero error pins the error metric itself
    assert(stats(1).max_abs_err === 0 && stats(1).err_sum === 0L)
    // JPEG magic in the actual payload would be checked here, but the
    // operator is single-pass; garbage-in instead: a non-JPEG byte blob
    // can't reach decode because the operator encodes its own input
  }

  test("real WAV roundtrip: decoded sample stats equal the synthesis rule") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "ab"), (1L, "x" * 20), (2L, "")).toDF("doc_id", "text")
    val stats = Multimodal.decodeAudioStats(Multimodal.encodeAudio(docs))
      .collect().sortBy(_.doc_id)
    assert(stats.length === 2) // empty doc filtered, never a 0-sample clip
    val a = stats(0)
    assert((a.sample_rate, a.n_samples) === (8000, 2L))
    assert(a.sample_sum === 'a'.toLong + 'b'.toLong)
    assert(a.n_distinct === 2)
    assert(a.mean_sample === a.sample_sum.toDouble / 2)
    assert(a.duration_us === 250L) // 2 samples at 8 kHz = 250 µs
    val b = stats(1)
    assert((b.n_samples, b.sample_sum, b.n_distinct) ===
      (20L, 'x'.toLong * 20, 1))
  }

  test("real multi-page TIFF roundtrip: frame count, order, and stats") {
    val s = spark
    import s.implicits._
    // "ab" → nb=2, nf=1 (one padded frame, bytes wrap: a b a b ...);
    // "x"*40 → nf=3 (40 bytes → frames 0,1 full, frame 2 wraps)
    val docs = Seq((0L, "ab"), (1L, "x" * 40), (2L, "")).toDF("doc_id", "text")
    val stats = Multimodal.decodeVideoStats(Multimodal.encodeVideo(docs))
      .collect().sortBy(_.doc_id)
    assert(stats.length === 2) // empty doc filtered
    val a = stats(0)
    assert(a.n_frames === 1)
    assert(a.px_sum === ('a'.toLong + 'b'.toLong) * 8) // 16 px wrapping "ab"
    assert(a.n_distinct_px === 2)
    assert(a.first_frame_sum === a.px_sum) // single frame
    assert(a.last_frame_sum === a.px_sum)
    val b = stats(1)
    assert(b.n_frames === 3)
    assert(b.px_sum === 'x'.toLong * 48)
    assert(b.n_distinct_px === 1)
    assert(b.mean_px === 'x'.toDouble)
  }

  test("video decode is real: payloads are valid TIFFs, order is decoded") {
    val s = spark
    import s.implicits._
    // 32 distinct bytes → 2 frames with different sums; order must hold
    val txt = (0 until 32).map(i => ('A' + i % 26).toChar).mkString
    val rows = Multimodal.encodeVideo(Seq((7L, txt)).toDF("doc_id", "text"))
      .collect()
    // TIFF magic (big- or little-endian) in the actual payload
    val magic = rows.head.tiff.take(2).map(_.toChar).mkString
    assert(magic === "MM" || magic === "II")
    val st = Multimodal.decodeVideoStats(
      Seq(TiffRow(7L, rows.head.tiff)).toDS()).head()
    val bytes = txt.getBytes("UTF-8").map(_ & 0xFF)
    assert(st.first_frame_sum === bytes.take(16).map(_.toLong).sum)
    assert(st.last_frame_sum === bytes.drop(16).map(_.toLong).sum)
    assert(st.first_frame_sum !== st.last_frame_sum)
    val garbage = Seq(TiffRow(8L, Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoStats(garbage).collect()
    }
  }

  test("audio decode is real: payloads are valid WAVs, garbage fails loudly") {
    val s = spark
    import s.implicits._
    val wavs = Multimodal.encodeAudio(
      Seq((7L, "hello")).toDF("doc_id", "text")).collect()
    // RIFF magic in the actual payload — the codec really ran
    assert(wavs.head.wav.take(4).map(_.toChar).mkString === "RIFF")
    assert(new String(wavs.head.wav.slice(8, 12), "US-ASCII") === "WAVE")
    val garbage = Seq(WavRow(8L, Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioStats(garbage).collect()
    }
  }

  test("decode is real: payloads are valid PNGs, garbage fails loudly") {
    val s = spark
    import s.implicits._
    val pngs = Multimodal.encodeImages(
      Seq((7L, "hello")).toDF("doc_id", "text")).collect()
    // PNG magic in the actual payload — the codec really ran
    assert(pngs.head.png.take(4).toSeq ===
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val garbage = Seq(ImageRow(8L, Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageStats(garbage).collect()
    }
  }

  test("declarative frameSample == frameOffsets on every payload length") {
    val s = spark
    import s.implicits._
    // lengths straddling each boundary: sub-frame, exact multiples,
    // take ∈ {1..8}, non-dividing remainders
    val lens = Seq(1, 10, 63, 64, 65, 128, 129, 200, 320, 448, 512, 513, 999)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, "x" * n, "src") }
      .toDF("doc_id", "text", "source")
    val got = Multimodal.frameSample(Multimodal.syntheticMedia(docs), 64, 8)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(4)).map(_.getInt(5)).toSeq }
    lens.zipWithIndex.foreach { case (n, i) =>
      assert(got(i.toLong) === Multimodal.frameOffsets(n, 64, 8),
        s"payload length $n")
    }
  }

  test("aHash: sub-57-sample clips — empty frames compare as zero energy") {
    val s = spark
    import s.implicits._
    // n=3: samples land in frames 0, 19, 38 (i·57 DIV 3 = 19i); every
    // other frame is EMPTY → only rises 18 and 37 set, so any two
    // 3-char clips of printable text hash identically (hamming 0), and
    // a 2-char clip (single rise at 27) sits exactly 3 bits away
    val docs = Seq((0L, "abc"), (1L, "xyz"), (2L, "ab"))
      .toDF("doc_id", "text")
    val hashes = Multimodal.aHashes(Multimodal.encodeAudio(docs))
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(hashes(0L) === ((1L << 18) | (1L << 37)))
    assert(hashes(0L) === hashes(1L))
    assert(hashes(2L) === (1L << 27))
    val pairs = Multimodal.ahashDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs === Map((0L, 1L) -> 0, (0L, 2L) -> 3, (1L, 2L) -> 3))
  }

  test("sceneCuts: delta matches the synthesis rule, single frame has none") {
    val s = spark
    import s.implicits._
    val txt = "abcdefghijklmnopQRST" // 20 bytes -> 2 frames
    val docs = Seq((0L, txt), (1L, "xyz")).toDF("doc_id", "text")
    val got = Multimodal.sceneCuts(Multimodal.encodeVideo(docs), 100L)
      .collect().map(c => c.doc_id -> c).toMap
    val b = txt.getBytes("UTF-8").map(_ & 0xFF)
    val expectDelta = (0 until 16)
      .map(i => math.abs(b(i) - b((i + 16) % 20)).toLong).sum
    val c0 = got(0L)
    assert(c0.n_frames === 2 && c0.n_transitions === 1)
    assert(c0.max_delta === expectDelta && c0.sum_delta === expectDelta)
    assert(c0.n_cuts === (if (expectDelta > 100L) 1 else 0))
    val c1 = got(1L)
    assert(c1.n_frames === 1 && c1.n_transitions === 0 &&
      c1.n_cuts === 0 && c1.sum_delta === 0L)
  }

  test("audioFeatures: hand-computed ZCR/energy/autocorr on known byte streams") {
    val s = spark
    import s.implicits._
    // "ast": bytes 97,115,116 → centered -31,-13,-12 (all <128: zcr 0)
    // "a!t": bytes 97,33,116 → centered -31,-95,-12 — still zcr 0;
    // mix above/below 128: "aä" (UTF-8 97,195,164) → -31,67,36: one
    // straddle of 128 (97→195; 195→164 stays above) → zcr 1
    val docs = Seq((0L, "ast"), (1L, "aä")).toDF("doc_id", "text")
    val got = Multimodal.audioFeatures(Multimodal.encodeAudio(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val f0 = got(0L)
    assert(f0.n_samples === 3L && f0.zcr === 0L)
    assert(f0.energy === (31L * 31 + 13 * 13 + 12 * 12))
    assert(f0.ac1 === ((-31L) * (-13) + (-13L) * (-12)))
    assert(f0.ac2 === ((-31L) * (-12)))
    assert(f0.ac4 === 0L && f0.ac8 === 0L)
    assert(f0.best_lag === 1) // ac1=559 > ac2=372
    val f1 = got(1L)
    assert(f1.n_samples === 3L && f1.zcr === 1L)
    assert(f1.energy === (31L * 31 + 67 * 67 + 36 * 36))
    assert(f1.ac1 === ((-31L) * 67 + 67L * 36))
    assert(f1.ac2 === ((-31L) * 36))
    // ac1=335, ac2=-1116 → lag 1 wins
    assert(f1.best_lag === 1)
  }

  test("audioSilence: run boundaries — min-run cutoff, stream-end close, " +
    "sub-threshold runs still count toward longest") {
    val s = spark
    import s.implicits._
    // 'x' = 120 → centered -8 (silent, |c| < 16); 'A' = 65 → -63 (loud)
    val docs = Seq(
      (0L, "xxxxAxxA"), // 4-run (counts) + 2-run (below minRun)
      (1L, "AAxxxx"),   // trailing run must be closed at stream end
      (2L, "AAA"),      // no silence at all
      (3L, "xxx")       // entire clip one 3-run: below minRun, longest 3
    ).toDF("doc_id", "text")
    val got = Multimodal.audioSilence(Multimodal.encodeAudio(docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(got(0L).silent_samples === 6L)
    assert(got(0L).n_runs === 1L)      // the 2-run is below minRun=4
    assert(got(0L).longest_run === 4L)
    assert(got(1L).n_runs === 1L && got(1L).longest_run === 4L)
    assert(got(2L).silent_samples === 0L && got(2L).n_runs === 0L &&
      got(2L).longest_run === 0L)
    assert(got(3L).n_runs === 0L && got(3L).longest_run === 3L)
  }

  test("goertzel: hand-stepped recursion; square waves pick their bin") {
    val s = spark
    import s.implicits._
    // "AB" → centered −63, −62. π/4 bin: s₁=−63 then
    // s=−62+√2·(−63)−0; π/2 bin: states (−62, −63) → P = 62²+63²
    val c2 = math.sqrt(2.0)
    val docs = Seq((0L, "AB"),
      // period-8 square wave (4 high + 4 low) ×4 → 1 kHz fundamental
      (1L, "zzzz    " * 4),
      // period-4 square wave (2+2) ×8 → 2 kHz fundamental
      (2L, "zz  " * 8)).toDF("doc_id", "text")
    val got = Multimodal.goertzel(Multimodal.encodeAudio(docs))
      .collect().map(g => g.doc_id -> g).toMap
    val g0 = got(0L)
    val sa2 = -63.0
    val sa1 = -62.0 + c2 * -63.0 - 0.0
    assert(g0.p1k === (sa1 * sa1 + sa2 * sa2 - c2 * sa1 * sa2))
    assert(g0.p2k === (62.0 * 62 + 63.0 * 63))
    assert(got(1L).dominant === "1k" && got(1L).p1k > got(1L).p2k * 10)
    assert(got(2L).dominant === "2k" && got(2L).p2k > got(2L).p1k * 10)
  }

  test("tile signatures: quadrant boxes, exact MD5 keys, crop matches tile 0") {
    val s = spark
    import s.implicits._
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // "abc"*11 → nb=33, w=1+33%16=2, h=1+(33/16)%16=3: w2=1, h2=1
    // pixels row-major = bytes of "abc"*11 then byte 0 again (2*3=6 px):
    // a b / c a / b c → tiles: 0=(0,0)=a; 1=col1 rows[0,1)=b;
    // 2=col0 rows[1,3)=c,b; 3=col1 rows[1,3)=a,c
    val docs = Seq((0L, "abc" * 11)).toDF("doc_id", "text")
    val full = Multimodal.encodeImages(docs)
    val sigs = Multimodal.tileSignatures(full).collect()
      .map(t => t.tile -> t).toMap
    def hx(cs: String): String = cs.map(c => f"${c.toInt}%02x").mkString
    assert(sigs(0).sig === md5hex(hx("a")))
    assert((sigs(0).tile_w, sigs(0).tile_h) === ((1, 1)))
    assert(sigs(1).sig === md5hex(hx("b")))
    assert(sigs(2).sig === md5hex(hx("cb"))) // column 0, rows 1..2
    assert((sigs(2).tile_w, sigs(2).tile_h) === ((1, 2)))
    assert(sigs(3).sig === md5hex(hx("ac")))

    // the REAL crop (getSubimage → PNG re-encode → decode), signed over
    // its WHOLE raster, equals the source's tile 0 — two lossless codec
    // roundtrips proven by the exact content key. (Re-tiling the crop
    // would probe with its quarter-crop instead — wholeSignature exists
    // for exactly this.)
    val crop = Multimodal.wholeSignature(Multimodal.cropTopLeft(full))
      .collect()
    assert(crop.length === 1 && crop.head.tile === -1)
    assert(crop.head.sig === sigs(0).sig)
    // a wider crop: "x"*37 → nb=37, w=6, h=3 → crop 3×1; whole-crop sig
    // equals that image's tile-0 sig (multi-pixel row, not the 1×1 case)
    val wide = Multimodal.encodeImages(Seq((2L, "x" * 37)).toDF("doc_id", "text"))
    val wsigs = Multimodal.tileSignatures(wide).collect().map(t => t.tile -> t).toMap
    val wcrop = Multimodal.wholeSignature(Multimodal.cropTopLeft(wide)).collect()
    assert((wsigs(0).tile_w, wsigs(0).tile_h) === ((3, 1)))
    assert(wcrop.head.sig === wsigs(0).sig && wcrop.head.sig === md5hex(hx("xxx")))

    // a 1×1 image has exactly one tile (empty bands emit nothing):
    // nb=256 → w = 1+256%16 = 1, h = 1+(256/16)%16 = 1, pixel = byte 0
    val one = Multimodal.tileSignatures(
      Multimodal.encodeImages(Seq((1L, "z" * 256)).toDF("doc_id", "text")))
      .collect()
    assert(one.length === 1 && one.head.sig === md5hex(hx("z")))
  }
}
