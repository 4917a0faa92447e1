package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures are hand-assembled from the PUBLIC ISO 14496-12 box
  * layout: every expected value is computed from the spec's field
  * offsets, independent of the parser under test. */
class Mp4ParserSpec extends AnyFunSuite {

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
  private def cc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    u32(body.length + 8L) ++ cc(t) ++ body

  private def ftyp(brand: String = "isom"): Array[Byte] =
    box("ftyp", cc(brand) ++ u32(0) ++ cc(brand))

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(timescale) ++ u32(duration))

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
      u32(timescale) ++ u64(duration))

  private def sampleEntry(fmt: String): Array[Byte] =
    u32(16) ++ cc(fmt) ++ Array.fill[Byte](8)(0)

  private def trak(handler: String, fmts: String*): Array[Byte] = {
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ cc(handler) ++
      Array.fill[Byte](12)(0))
    val stsd = box("stsd",
      u32(0) ++ u32(fmts.length.toLong) ++ fmts.flatMap(sampleEntry).toArray)
    box("trak", box("mdia", hdlr ++ box("minf", box("stbl", stsd))))
  }

  test("v0 mvhd: brand, timescale, duration, exact floor durationMs") {
    val bytes = ftyp() ++ box("moov", mvhdV0(600, 1234) ++ trak("vide", "avc1"))
    val m = Mp4Parser.parseMp4(bytes).get
    assert(m.majorBrand === "isom" && m.timescale === 600 && m.duration === 1234)
    assert(m.durationMs === 1234L * 1000 / 600) // 2056, floored
    assert(m.tracks === 1 && m.handlers === Seq("vide") && m.codecs === Seq("avc1"))
  }

  test("v1 mvhd: 64-bit creation/modification offsets and 64-bit duration") {
    val bytes = ftyp("mp42") ++
      box("moov", mvhdV1(90000, 5000000000L) ++ trak("vide", "avc1"))
    val m = Mp4Parser.parseMp4(bytes).get
    assert(m.majorBrand === "mp42" && m.timescale === 90000)
    assert(m.duration === 5000000000L)
    assert(m.durationMs === 5000000000L * 1000 / 90000)
  }

  test("two tracks: handlers and codecs collected sorted") {
    val bytes = ftyp() ++ box("moov",
      mvhdV0(1000, 42) ++ trak("vide", "avc1") ++ trak("soun", "mp4a"))
    val m = Mp4Parser.parseMp4(bytes).get
    assert(m.tracks === 2)
    assert(m.handlers === Seq("soun", "vide")) // sorted, not file order
    assert(m.codecs === Seq("avc1", "mp4a"))
  }

  test("multiple stsd sample entries in one track are all reported") {
    val bytes = ftyp() ++ box("moov",
      mvhdV0(1000, 42) ++ trak("vide", "hvc1", "avc1"))
    assert(Mp4Parser.parseMp4(bytes).get.codecs === Seq("avc1", "hvc1"))
  }

  test("largesize (size==1, 64-bit) header is honored") {
    val body = cc("isom") ++ u32(0) ++ cc("isom")
    val large = u32(1) ++ cc("ftyp") ++ u64(body.length + 16L) ++ body
    val bytes = large ++ box("moov", mvhdV0(600, 60) ++ trak("vide", "avc1"))
    val m = Mp4Parser.parseMp4(bytes).get
    assert(m.majorBrand === "isom" && m.durationMs === 100)
  }

  test("size==0 (to end of file) accepted at top level only") {
    val ok = ftyp() ++ box("moov", mvhdV0(600, 60) ++ trak("vide", "avc1")) ++
      (u32(0) ++ cc("mdat") ++ Array.fill[Byte](5)(7))
    assert(Mp4Parser.parseMp4(ok).get.tracks === 1)
    // the same size==0 box nested inside moov is malformed
    val nested = ftyp() ++
      box("moov", mvhdV0(600, 60) ++ (u32(0) ++ cc("free")))
    assert(Mp4Parser.parseMp4(nested).isEmpty)
  }

  test("malformed inputs return None, never throw") {
    val good = ftyp() ++ box("moov", mvhdV0(600, 60) ++ trak("vide", "avc1"))
    assert(Mp4Parser.parseMp4(null).isEmpty)
    assert(Mp4Parser.parseMp4(Array.empty[Byte]).isEmpty)
    assert(Mp4Parser.parseMp4(good.dropRight(3)).isEmpty)  // truncated
    assert(Mp4Parser.parseMp4(ftyp()).isEmpty)             // no moov/mvhd
    // box size overruns its parent
    val overrun = ftyp() ++ box("moov", u32(9999) ++ cc("mvhd"))
    assert(Mp4Parser.parseMp4(overrun).isEmpty)
    // box size smaller than its own header
    val tiny = ftyp() ++ box("moov", u32(4) ++ cc("free") ++ mvhdV0(600, 60))
    assert(Mp4Parser.parseMp4(tiny).isEmpty)
  }

  test("truncated leaf boxes fail instead of reading sibling bytes") {
    // an mvhd whose declared size is too small for its v0 fields: the
    // timescale/duration reads would land in the NEXT box's bytes —
    // must be None, not garbage Some(...)
    val shortMvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0)) // 8 < 20
    val bytes = ftyp() ++ box("moov", shortMvhd ++ trak("vide", "avc1"))
    assert(Mp4Parser.parseMp4(bytes).isEmpty)
    // v1 mvhd needs 32 body bytes; give it a v0-sized body
    val shortV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(600) ++ u32(60)) // 20 < 32
    assert(Mp4Parser.parseMp4(
      ftyp() ++ box("moov", shortV1 ++ trak("vide", "avc1"))).isEmpty)
    // hdlr with body < 12: handler_type would come from the sibling
    val shortHdlr = box("trak", box("mdia", box("hdlr", u32(0)) ++
      box("minf", Array.empty[Byte])))
    assert(Mp4Parser.parseMp4(
      ftyp() ++ box("moov", mvhdV0(600, 60) ++ shortHdlr)).isEmpty)
    // stsd with body < 8: entry_count would come from outside the box
    val shortStsd = box("trak", box("mdia", box("minf", box("stbl",
      box("stsd", u32(0))))))
    assert(Mp4Parser.parseMp4(
      ftyp() ++ box("moov", mvhdV0(600, 60) ++ shortStsd)).isEmpty)
    // empty ftyp: no room for the brand fourcc
    assert(Mp4Parser.parseMp4(
      box("ftyp", Array.empty[Byte]) ++
        box("moov", mvhdV0(600, 60) ++ trak("vide", "avc1"))).isEmpty)
  }

  test("fuzz totality: arbitrary bytes parse to Some or None, no throw") {
    val rnd = new scala.util.Random(414)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      Mp4Parser.parseMp4(b) // must not throw
    }
    // seeded structural fuzz: corrupt one byte of a valid file
    val good = ftyp() ++ box("moov",
      mvhdV1(600, 60) ++ trak("vide", "avc1") ++ trak("soun", "mp4a"))
    (0 until good.length).foreach { i =>
      val b = good.clone()
      b(i) = (b(i) ^ 0x80).toByte
      Mp4Parser.parseMp4(b)
    }
  }
}
