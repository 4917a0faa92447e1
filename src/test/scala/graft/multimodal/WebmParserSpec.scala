package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** EBML census: build→parse round trips, VINT widths, unknown-size
  * Segment, Void skipping, default timestamp scale, and totality. */
class WebmParserSpec extends AnyFunSuite {
  import WebmParser._

  test("webm round trip: doc type, scale, tracks, codecs") {
    val m = parseWebm(buildWebm("webm", 1000000L,
      Seq((1, "V_VP9"), (2, "A_OPUS")))).get
    assert(m === WebmMeta("webm", 1000000L, 2,
      Seq("video", "audio"), Seq("V_VP9", "A_OPUS")))
  }

  test("matroska doc type, non-default scale, subtitle + unknown track types") {
    val m = parseWebm(buildWebm("matroska", 500000L,
      Seq((1, "V_MPEG4/ISO/AVC"), (17, "S_TEXT/UTF8"), (5, "X_WEIRD")))).get
    assert(m.doc_type === "matroska")
    assert(m.timestamp_scale === 500000L)
    assert(m.track_types === Seq("video", "subtitle", "type5"))
  }

  test("void filler is skipped; multi-byte size VINTs exercised") {
    // 300-byte Void forces a 2-byte size vint inside the Segment
    val m = parseWebm(buildWebm("webm", 1000000L,
      Seq((2, "A_VORBIS")), fillerBytes = 300)).get
    assert(m === WebmMeta("webm", 1000000L, 1, Seq("audio"), Seq("A_VORBIS")))
  }

  test("unknown-size Segment extends to EOF; missing TimestampScale defaults") {
    val noScale = {
      // header + unknown-size Segment containing only Tracks
      val bytes = buildWebm("webm", 1000000L, Seq((1, "V_VP8")),
        unknownSegmentSize = true)
      parseWebm(bytes).get
    }
    assert(noScale.timestamp_scale === 1000000L)
    assert(noScale.n_tracks === 1)
  }

  test("totality: garbage, truncation, unknown-size non-Segment, oversize body") {
    val ok = buildWebm("webm", 1000000L, Seq((1, "V_VP9")))
    assert(parseWebm(null) === None)
    assert(parseWebm(Array.fill[Byte](7)(0x1a)) === None)
    for (n <- Seq(8, ok.length - 1))
      assert(parseWebm(java.util.Arrays.copyOf(ok, n)) === None)
    // an unknown-size vint (0xFF) on a TrackEntry is malformed here:
    // the TrackEntry (0xAE) starts right after the Tracks box header
    // (4-byte ID 16 54 AE 6B + 1-byte size)
    val bad = ok.clone()
    val aePos = ok.indexOfSlice(
      Array(0x16.toByte, 0x54.toByte, 0xAE.toByte, 0x6B.toByte)) + 5
    assert(ok(aePos) === 0xAE.toByte)
    bad(aePos + 1) = 0xff.toByte
    assert(parseWebm(bad) === None)
    val rnd = new scala.util.Random(5)
    for (n <- Seq(0, 8, 64, 700))
      parseWebm(Array.fill[Byte](n)(rnd.nextInt().toByte)) // must not throw
  }
}
