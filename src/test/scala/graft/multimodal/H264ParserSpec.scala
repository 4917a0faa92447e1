package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex-B census: builder round trip over a parameter grid,
  * both start-code forms, and fuzz totality. */
class H264ParserSpec extends AnyFunSuite {

  test("builder round trip recovers profile/level and slice census") {
    for {
      (pidc, pname) <- Seq(66 -> "Baseline", 77 -> "Main", 100 -> "High")
      lvl <- Seq(30, 31, 40, 41, 50)
      nIdr <- Seq(1, 3)
      nNonIdr <- Seq(0, 2, 7)
    } {
      val m = H264Parser.parseAnnexB(
        H264Parser.buildAnnexB(pidc, lvl, nIdr, nNonIdr)).get
      assert(m.profile === pname)
      assert(m.profileIdc === pidc && m.levelIdc === lvl)
      assert(m.width === 320 && m.height === 240) // builder default
      assert(m.nSps === 1 && m.nPps === 1)
      assert(m.nIdr === nIdr && m.nNonIdr === nNonIdr)
      assert(m.nNal === 2 + nIdr + nNonIdr)
    }
  }

  test("SPS Exp-Golomb walk recovers dimensions across mb-grid and crop shapes") {
    for {
      pidc <- Seq(66, 77, 100) // 100 exercises the chroma-format branch
      (w, h) <- Seq((16, 16), (176, 144), (320, 240), (1280, 720),
        (1920, 1080), (3840, 2160), // 1080 = 68 mbs * 16 - 8: cropping
        (426, 240), (854, 480)) // non-multiple-of-16 both axes
    } {
      val m = H264Parser.parseAnnexB(
        H264Parser.buildAnnexB(pidc, 40, 1, 1, width = w, height = h)).get
      assert(m.width === w && m.height === h, s"pidc=$pidc ${w}x$h")
    }
  }

  test("emulation prevention: large mb counts with 00 00 runs still round-trip") {
    // a wide frame makes pic_width_in_mbs_minus1's Golomb prefix long
    // (many zero bits -> 00 00 byte runs), forcing escapeRbsp/deEscape
    // to actually fire; 8192/16 - 1 = 511 = 10 zero-bit prefix
    val m = H264Parser.parseAnnexB(
      H264Parser.buildAnnexB(66, 50, 1, 0, width = 8192, height = 4320)).get
    assert(m.width === 8192 && m.height === 4320)
  }

  test("3-byte and 4-byte start codes both frame NAL units") {
    // builder emits 4-byte codes for SPS/PPS and 3-byte for slices —
    // the round trip above exercises both; here pin the exact framing
    val b = H264Parser.buildAnnexB(66, 30, 1, 1)
    assert((b(0), b(1), b(2), b(3)) === (0, 0, 0, 1)) // SPS: long form
    val m = H264Parser.parseAnnexB(b).get
    assert(m.nNal === 4)
  }

  test("uncommon profile idc gets the numeric fallback name") {
    val m = H264Parser.parseAnnexB(H264Parser.buildAnnexB(144, 30, 1, 0)).get
    assert(m.profile === "P144")
  }

  test("malformed inputs return None, never throw; fuzz totality") {
    assert(H264Parser.parseAnnexB(null).isEmpty)
    assert(H264Parser.parseAnnexB(Array.empty[Byte]).isEmpty)
    assert(H264Parser.parseAnnexB(Array[Byte](1, 2, 3, 4, 5, 6)).isEmpty)
    // does not begin with a start code
    val good = H264Parser.buildAnnexB(66, 30, 1, 1)
    assert(H264Parser.parseAnnexB(0x55.toByte +: good).isEmpty)
    // forbidden_zero_bit set on the first NAL header
    val forbidden = good.clone(); forbidden(4) = (forbidden(4) | 0x80).toByte
    assert(H264Parser.parseAnnexB(forbidden).isEmpty)
    // SPS truncated before level_idc: header byte then next start code
    val trunc = Array[Byte](0, 0, 0, 1, 0x67, 0, 0, 1, 0x68, 0xce.toByte)
    assert(H264Parser.parseAnnexB(trunc).isEmpty)
    // stream with slices but no SPS: profile unknown → None
    val noSps = Array[Byte](0, 0, 1, 0x65, 0x25, 0x11)
    assert(H264Parser.parseAnnexB(noSps).isEmpty)
    // deterministic fuzz: parser is total on arbitrary bytes
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(64)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      H264Parser.parseAnnexB(bytes) // must not throw
    }
  }

  test("parseSliceHeaders: planted slice types recovered in stream order") {
    val types = Seq(7, 0, 1, 5, 2, 6, 3, 4) // I P B P I B SP SI (mod 5)
    val stream = H264Parser.buildAnnexBGop(66, 30, types)
    val got = H264Parser.parseSliceHeaders(stream).get
    assert(got.map(_.sliceType) === types)
    assert(got.map(_.idx) === types.indices)
    assert(got.map(_.kind) === Seq("I", "P", "B", "P", "I", "B", "SP", "SI"))
    // IDR NAL type iff slice kind is I
    assert(got.map(_.nalType) === Seq(5, 1, 1, 1, 5, 1, 1, 1))
    // the SPS/PPS census still agrees on the same stream
    val meta = H264Parser.parseAnnexB(stream).get
    assert(meta.nIdr === 2 && meta.nNonIdr === 6)
  }

  test("parseSliceHeaders: out-of-range slice_type and malformed input -> None") {
    assert(H264Parser.parseSliceHeaders(null).isEmpty)
    assert(H264Parser.parseSliceHeaders(Array[Byte](0, 0, 1)).isEmpty)
    // a stream with no coded slices (SPS+PPS only) has nothing to census
    val bare = H264Parser.buildAnnexBGop(66, 30, Nil)
    assert(H264Parser.parseSliceHeaders(bare).isEmpty)
    val good = H264Parser.buildAnnexBGop(100, 41, Seq(2, 0, 0, 1))
    for (cut <- 0 until good.length)
      H264Parser.parseSliceHeaders(good.take(cut)) // totality
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 300) {
      val buf = Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt(256).toByte)
      H264Parser.parseSliceHeaders(buf)
    }
  }
}
