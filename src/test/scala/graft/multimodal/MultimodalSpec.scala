package graft.multimodal

import graft.SparkFunSuite
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  test("byteHistogram: deterministic, normalized histogram") {
    val payload = Array.tabulate(256)(_.toByte)
    val h1 = Multimodal.byteHistogram(payload, 16)
    val h2 = Multimodal.byteHistogram(payload, 16)
    assert(h1.toSeq === h2.toSeq)
    assert(math.abs(h1.sum - 1.0f) < 1e-5)
    // uniform bytes → uniform histogram
    assert(h1.forall(v => math.abs(v - 1.0f / 16) < 1e-6))
    assert(Multimodal.byteHistogram(Array.empty, 16).forall(_ === 0f))
  }

  test("extractFeatures: distributed over binary payloads, schema + counts") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val payloads = emb.select(col("vec_id"),
      GraftFunctions.toBinaryVector(col("embedding")).as("payload"))
    val feats = Multimodal.extractFeatures(payloads, "vec_id", "payload", bins = 16)
    val rows = feats.collect()
    assert(rows.length === emb.count())
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(_.n_bytes === 64 * 4 + 1)) // 64-dim f32 + tag
  }

  test("imageAHash documented defaults (8x8 = 64 bits) work; bit 63 carries signal") {
    import spark.implicits._
    // 8x8 image, only the LAST cell bright: every bit clear except grid
    // cell 63 — the Long's sign bit. Hashes compare for equality /
    // Hamming distance, never order, so all 64 bits are usable.
    val px = Array.fill(63)(0) :+ 255
    val df = Seq((1L, pgm(8, 8, px))).toDF("id", "payload")
    val rows = Multimodal.imageAHash(df, "id", "payload").collect()
    assert(rows.length === 1)
    assert(rows(0).ahash === (1L << 63)) // == Long.MinValue: sign bit set
  }

  private def pgm(w: Int, h: Int, pixels: Array[Int],
      header: String = null): Array[Byte] = {
    val hdr = if (header != null) header else s"P5\n$w $h\n255\n"
    hdr.getBytes("US-ASCII") ++ pixels.map(_.toByte)
  }

  test("Netpbm decode: P5 gradient, dimensions and pixels exact") {
    val px = Array.tabulate(6 * 8)(i => (i * 5) % 256)
    val img = Multimodal.decodeNetpbm(pgm(6, 8, px)).get
    assert(img.width === 6)
    assert(img.height === 8)
    assert(img.gray.toSeq === px.toSeq)
  }

  test("Netpbm decode: header comments and arbitrary whitespace") {
    val px = Array.fill(4)(7)
    val withComment = pgm(2, 2, px, "P5\n# a comment\n 2\t2 # trailing\n255\n")
    val img = Multimodal.decodeNetpbm(withComment).get
    assert(img.width === 2 && img.height === 2)
    assert(img.gray.toSeq === px.toSeq)
  }

  test("Netpbm decode: P6 RGB collapses to BT.601 luminance") {
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    val bytes = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ rgb.map(_.toByte)
    val img = Multimodal.decodeNetpbm(bytes).get
    // (299R + 587G + 114B) / 1000, integer math
    assert(img.gray.toSeq === Seq(255 * 299 / 1000, 255 * 587 / 1000,
      255 * 114 / 1000, (255 * 299 + 255 * 587 + 255 * 114) / 1000))
  }

  test("Netpbm decode: malformed inputs return None, never throw") {
    assert(Multimodal.decodeNetpbm(null).isEmpty)
    assert(Multimodal.decodeNetpbm("JUNK".getBytes).isEmpty)
    assert(Multimodal.decodeNetpbm(pgm(4, 4, Array.fill(3)(0))).isEmpty) // truncated
    assert(Multimodal.decodeNetpbm(
      "P5\n2 2\n70000\n????????".getBytes("US-ASCII")).isEmpty) // maxval > 255
    // arbitrary fuzz: decoder is total
    val r = new java.util.Random(5)
    (1 to 500).foreach { _ =>
      val b = new Array[Byte](r.nextInt(64)); r.nextBytes(b)
      Multimodal.decodeNetpbm(b) // must not throw
    }
  }

  test("downsample: nearest-neighbor picks the expected source pixels") {
    val img = Multimodal.RasterImage(4, 4, Array.tabulate(16)(identity))
    val half = Multimodal.downsample(img, 2, 2)
    assert(half.gray.toSeq === Seq(0, 2, 8, 10))
  }

  test("extractImageFeatures end-to-end: decode + histogram distributed") {
    import spark.implicits._
    val good = pgm(2, 2, Array(0, 0, 16, 255))
    val rows = Seq((1L, good), (2L, "not an image".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.extractImageFeatures(rows, "doc_id", "payload", bins = 16)
      .collect()
    assert(got.length === 1) // the non-image row is dropped
    assert(got.head.width === 2 && got.head.height === 2)
    assert(got.head.hist.toSeq === Seq(2L, 1L) ++ Seq.fill(13)(0L) :+ 1L)
  }

  test("imageAHash: brightness-shift invariant, pattern-sensitive, downsampled") {
    import spark.implicits._
    val pattern = Array.tabulate(6 * 8)(i => if (i % 3 == 0) 200 else 20)
    val brighter = pattern.map(p => (p + 30) min 255) // uniform shift
    val inverse = pattern.map(p => if (p == 200) 20 else 200)
    val big = Array.tabulate(12 * 16) { i =>
      val (r, c) = (i / 12, i % 12)
      pattern((r / 2) * 6 + (c / 2)) // 2x2 blocks of the 6x8 pattern
    }
    val rows = Seq(
      (1L, pgm(6, 8, pattern)), (2L, pgm(6, 8, brighter)),
      (3L, pgm(6, 8, inverse)), (4L, pgm(12, 16, big)),
      (5L, "not an image".getBytes)).toDF("doc_id", "payload")
    val h = Multimodal.imageAHash(rows, "doc_id", "payload", hashW = 6, hashH = 8)
      .collect().map(r => r.id -> r.ahash).toMap
    assert(h.size === 4)              // non-image dropped
    assert(h(1L) === h(2L))           // v·n > Σv is shift-invariant
    assert(h(1L) !== h(3L))           // inverted pattern separates
    assert(h(4L) === h(1L))           // downsample recovers the base pattern
    // bits match a direct recomputation
    val total = pattern.map(_.toLong).sum
    val expect = pattern.zipWithIndex
      .collect { case (p, i) if p * 48L > total => 1L << i }.sum
    assert(h(1L) === expect)
  }

  private def le16b(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int) = le16b(v & 0xffff) ++ le16b((v >> 16) & 0xffff)
  private def wav(samples: Seq[Int], channels: Int = 1, rate: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val data = samples.flatMap(le16b)
    val extra = if (extraChunk)
      "LIST".getBytes("US-ASCII").toSeq ++ le32b(4) ++ "INFO".getBytes("US-ASCII").toSeq
    else Seq.empty[Byte]
    ("RIFF".getBytes("US-ASCII").toSeq ++ le32b(4 + 24 + extra.length + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII").toSeq ++ extra ++
      "fmt ".getBytes("US-ASCII").toSeq ++ le32b(16) ++
      le16b(1) ++ le16b(channels) ++ le32b(rate) ++ le32b(rate * 2 * channels) ++
      le16b(2 * channels) ++ le16b(16) ++
      "data".getBytes("US-ASCII").toSeq ++ le32b(data.length) ++ data).toArray
  }

  test("videoFingerprint: container-robust, frame-order sensitive, non-video dropped") {
    import spark.implicits._
    val f1 = Array.tabulate(24)(i => (if (i % 3 == 0) 200 else 20).toByte)
    val f2 = Array.tabulate(24)(i => (if (i % 3 == 1) 200 else 20).toByte)
    val rows = Seq(
      (1L, y4m("YUV4MPEG2 W4 H6 F25:1 Cmono\n", Seq(f1, f2))),
      // same frames, different header metadata (frame rate) → collide
      (2L, y4m("YUV4MPEG2 W4 H6 F30:1 Cmono\n", Seq(f1, f2))),
      // same frames, swapped order → differ
      (3L, y4m("YUV4MPEG2 W4 H6 F25:1 Cmono\n", Seq(f2, f1))),
      (4L, "not a video".getBytes)).toDF("doc_id", "payload")
    val h = Multimodal.videoFingerprint(rows, "doc_id", "payload")
      .collect().map(r => r.id -> r.vfp).toMap
    assert(h.size === 3)
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("audioFingerprint: volume-scale invariant, pattern-sensitive, non-audio dropped") {
    import spark.implicits._
    val pattern = Seq.tabulate(48)(i => if (i % 4 == 0) 900 else 100)
    val louder = pattern.map(_ * 3)          // same clip, 3x gain
    val other = Seq.tabulate(48)(i => if (i % 4 == 0) 100 else 900)
    val rows = Seq(
      (1L, wav(pattern)), (2L, wav(louder)), (3L, wav(other)),
      (4L, "not audio".getBytes)).toDF("doc_id", "payload")
    val h = Multimodal.audioFingerprint(rows, "doc_id", "payload", nBits = 48)
      .collect().map(r => r.id -> r.afp).toMap
    assert(h.size === 3)
    assert(h(1L) === h(2L))   // s·n > Σs is gain-invariant
    assert(h(1L) !== h(3L))
    val total = pattern.map(_.toLong).sum
    val expect = pattern.zipWithIndex
      .collect { case (s, i) if s * 48L > total => 1L << i }.sum
    assert(h(1L) === expect)
  }

  test("WAV decode: mono PCM16 samples round-trip, negatives included") {
    val s = Seq(0, 1000, -1000, 32767, -32768, 42)
    val audio = Multimodal.decodeWavPcm16(wav(s)).get
    assert(audio.sampleRate === 8000)
    assert(audio.channels === 1)
    assert(audio.samples.toSeq.map(_.toInt) === s)
  }

  test("WAV decode: stereo mixes to mono; unknown chunks are skipped") {
    // frames (L,R): (100,200), (-100,100) -> mono (150, 0)
    val audio = Multimodal.decodeWavPcm16(
      wav(Seq(100, 200, -100, 100), channels = 2, extraChunk = true)).get
    assert(audio.channels === 2)
    assert(audio.samples.toSeq.map(_.toInt) === Seq(150, 0))
  }

  test("WAV decode: malformed inputs return None, never throw") {
    assert(Multimodal.decodeWavPcm16(null).isEmpty)
    assert(Multimodal.decodeWavPcm16("RIFFjunk".getBytes).isEmpty)
    val truncated = wav(Seq(1, 2, 3)).dropRight(2)
    assert(Multimodal.decodeWavPcm16(truncated).isEmpty)
    val r = new java.util.Random(11)
    (1 to 500).foreach { _ =>
      val b = new Array[Byte](r.nextInt(128)); r.nextBytes(b)
      Multimodal.decodeWavPcm16(b) // total
    }
  }

  test("extractAudioFeatures: windowed energy and zero crossings, hand-computed") {
    import spark.implicits._
    // 4 samples, 2 windows of 2: energies 1^2+(-1)^2=2 and 2^2+(-2)^2=8;
    // zc counts sign flips WITHIN each window (1 each)
    val rows = Seq((7L, wav(Seq(1, -1, 2, -2)))).toDF("doc_id", "payload")
    val got = Multimodal.extractAudioFeatures(rows, "doc_id", "payload", nWindows = 2)
      .collect().sortBy(_.window)
    assert(got.map(r => (r.window, r.energy, r.zero_crossings)).toSeq ===
      Seq((0, 2L, 1L), (1, 8L, 1L)))
    assert(got.forall(r => r.sample_rate == 8000 && r.n_samples == 4L))
  }

  private def y4m(header: String, frames: Seq[Array[Byte]],
      frameParams: String = ""): Array[Byte] =
    (header.getBytes("US-ASCII").toSeq ++
      frames.flatMap(f => s"FRAME$frameParams\n".getBytes("US-ASCII").toSeq ++ f.toSeq)).toArray

  test("Y4M decode: mono frames round-trip, header tags in any order") {
    val f0 = Array.tabulate(6)(i => i.toByte)
    val f1 = Array.tabulate(6)(i => (100 + i).toByte)
    val v = Multimodal.decodeY4m(
      y4m("YUV4MPEG2 F25:1 H2 Cmono W3 Ip A1:1\n", Seq(f0, f1))).get
    assert(v.width === 3 && v.height === 2)
    assert(v.frames.length === 2)
    assert(v.frames(0).toSeq === (0 until 6))
    assert(v.frames(1).toSeq === (100 until 106))
  }

  test("Y4M decode: 4:2:0 chroma planes are skipped, frame boundaries stay exact") {
    // 2x2 C420: luma 4 bytes + chroma 2x(1x1) = 2 bytes per frame
    val frame0 = Array[Byte](1, 2, 3, 4, 99, 99)
    val frame1 = Array[Byte](5, 6, 7, 8, 77, 77)
    val v = Multimodal.decodeY4m(
      y4m("YUV4MPEG2 W2 H2 C420jpeg\n", Seq(frame0, frame1))).get
    assert(v.frames.length === 2)
    assert(v.frames(0).toSeq === Seq(1, 2, 3, 4)) // chroma bytes excluded
    assert(v.frames(1).toSeq === Seq(5, 6, 7, 8))
    // no C tag -> spec default 420
    val dflt = Multimodal.decodeY4m(y4m("YUV4MPEG2 W2 H2\n", Seq(frame0))).get
    assert(dflt.frames(0).toSeq === Seq(1, 2, 3, 4))
  }

  test("Y4M decode: FRAME parameter lines are tolerated") {
    val v = Multimodal.decodeY4m(
      y4m("YUV4MPEG2 W2 H1 Cmono\n", Seq(Array[Byte](9, 8)), frameParams = " Xtag")).get
    assert(v.frames(0).toSeq === Seq(9, 8))
  }

  test("Y4M decode: malformed inputs return None, never throw") {
    assert(Multimodal.decodeY4m(null).isEmpty)
    assert(Multimodal.decodeY4m("JUNK".getBytes).isEmpty)
    assert(Multimodal.decodeY4m("YUV4MPEG2 W2 H2 Cmono\n".getBytes).isEmpty) // no frames
    assert(Multimodal.decodeY4m( // truncated luma plane
      y4m("YUV4MPEG2 W4 H4 Cmono\n", Seq(Array[Byte](1, 2, 3)))).isEmpty)
    assert(Multimodal.decodeY4m( // unsupported colorspace
      y4m("YUV4MPEG2 W1 H1 C999 \n", Seq(Array[Byte](1)))).isEmpty)
    assert(Multimodal.decodeY4m( // garbage where FRAME marker must be
      ("YUV4MPEG2 W1 H1 Cmono\nNOPE\nx").getBytes("US-ASCII")).isEmpty)
    val r = new java.util.Random(13)
    (1 to 500).foreach { _ =>
      val b = new Array[Byte](r.nextInt(128)); r.nextBytes(b)
      Multimodal.decodeY4m(b) // total
    }
  }

  test("sampleVideoFrames: every-Nth sampling with exact luma stats") {
    import spark.implicits._
    val frames = Seq(
      Array[Byte](10, 20), Array[Byte](30, 40), Array[Byte](50, 60), Array[Byte](70, 80))
    val rows = Seq(
      (1L, y4m("YUV4MPEG2 W2 H1 Cmono\n", frames)),
      (2L, "notvideo".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.sampleVideoFrames(rows, "doc_id", "payload", everyNth = 2)
      .collect().sortBy(r => (r.id, r.frame_idx))
    assert(got.map(r => (r.id, r.frame_idx, r.luma_sum, r.luma_min, r.luma_max)).toSeq ===
      Seq((1L, 0, 30L, 10, 20), (1L, 2, 110L, 50, 60))) // frames 1,3 skipped; bad row dropped
    assert(got.forall(r => r.width == 2 && r.height == 1))
  }
}
