package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Fixtures are hand-assembled from the PUBLIC header layout (ISO
  * 11172-3): every expected value below is computed from the published
  * tables, independent of the parser's own tables. */
class Mp3ParserSpec extends AnyFunSuite {

  /** One frame: (version bits, layer bits, bitrate idx, sr idx, padding). */
  private def frame(
      vBits: Int, lBits: Int, bIdx: Int, srIdx: Int, pad: Int,
      frameLen: Int): Array[Byte] = {
    val out = new Array[Byte](frameLen)
    out(0) = 0xff.toByte
    out(1) = (0xe0 | (vBits << 3) | (lBits << 1) | 1).toByte // no CRC
    out(2) = ((bIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    out(3) = 0
    out
  }

  private def stream(frames: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    frames.foreach(bos.write)
    bos.toByteArray
  }

  test("MPEG-1 Layer III CBR: tables, frame walk, exact duration") {
    // idx 9 = 128 kbps @ 44100: frameLen = 144*128000/44100 = 417
    val f = frame(vBits = 3, lBits = 1, bIdx = 9, srIdx = 0, pad = 0, frameLen = 417)
    val m = Mp3Parser.parseMp3(stream(f, f, f)).get
    assert(m.version === "MPEG1" && m.layer === 3)
    assert(m.bitrateKbps === 128 && m.sampleRate === 44100)
    assert(m.frames === 3 && !m.vbr)
    assert(m.durationMs === 3L * 1152 * 1000 / 44100) // 78 ms
  }

  test("padding bit lengthens the frame by one byte") {
    val padded = frame(3, 1, 9, 0, pad = 1, frameLen = 418)
    val m = Mp3Parser.parseMp3(stream(padded, padded)).get
    assert(m.frames === 2 && m.bitrateKbps === 128)
  }

  test("MPEG-2 Layer III: halved samples per frame and the low table") {
    // v2 L3 idx 5 = 40 kbps @ 22050 (sr idx 0): frameLen = 72*40000/22050 = 130
    val f = frame(vBits = 2, lBits = 1, bIdx = 5, srIdx = 0, pad = 0, frameLen = 130)
    val m = Mp3Parser.parseMp3(stream(f, f)).get
    assert(m.version === "MPEG2" && m.bitrateKbps === 40 && m.sampleRate === 22050)
    assert(m.durationMs === 2L * 576 * 1000 / 22050) // 576, not 1152
  }

  test("Layer I: slot-of-4 frame length and 384 samples") {
    // v1 L1 idx 4 = 128 kbps @ 32000 (sr idx 2): (12*128000/32000 + 0)*4 = 192
    val f = frame(vBits = 3, lBits = 3, bIdx = 4, srIdx = 2, pad = 0, frameLen = 192)
    val m = Mp3Parser.parseMp3(stream(f, f, f, f)).get
    assert(m.layer === 1 && m.bitrateKbps === 128 && m.sampleRate === 32000)
    assert(m.durationMs === 4L * 384 * 1000 / 32000) // 48 ms
  }

  test("VBR: differing bitrate indices set the flag, first frame is nominal") {
    val a = frame(3, 1, 9, 0, 0, 417)  // 128 kbps
    val b = frame(3, 1, 14, 0, 0, 1044) // 320 kbps: 144*320000/44100 = 1044
    val m = Mp3Parser.parseMp3(stream(a, b, a)).get
    assert(m.vbr && m.bitrateKbps === 128 && m.frames === 3)
  }

  test("ID3v2 tag is skipped via its syncsafe size") {
    val tag = new ByteArrayOutputStream()
    tag.write("ID3".getBytes); tag.write(4); tag.write(0); tag.write(0)
    tag.write(0); tag.write(0); tag.write(1); tag.write(3) // size = 131
    (0 until 131).foreach(_ => tag.write(0x55))
    val f = frame(3, 1, 9, 0, 0, 417)
    val m = Mp3Parser.parseMp3(stream(tag.toByteArray, f, f)).get
    assert(m.frames === 2 && m.bitrateKbps === 128)
  }

  test("ID3v2 footer flag adds 10 bytes to the tag skip") {
    // flags bit 4 (0x10) declares a footer: total tag = 10 header +
    // size + 10 footer (ID3v2.4 §3.1). Without the footer skip the
    // walk would land on the footer's '3DI' magic and parse nothing.
    val tag = new ByteArrayOutputStream()
    tag.write("ID3".getBytes); tag.write(4); tag.write(0); tag.write(0x10)
    tag.write(0); tag.write(0); tag.write(0); tag.write(20) // size = 20
    (0 until 20).foreach(_ => tag.write(0x55))
    tag.write("3DI".getBytes); tag.write(4); tag.write(0); tag.write(0x10)
    tag.write(0); tag.write(0); tag.write(0); tag.write(20) // footer mirror
    val f = frame(3, 1, 9, 0, 0, 417)
    val m = Mp3Parser.parseMp3(stream(tag.toByteArray, f, f)).get
    assert(m.frames === 2 && m.bitrateKbps === 128)
  }

  test("trailing garbage after valid frames ends the walk cleanly") {
    val f = frame(3, 1, 9, 0, 0, 417)
    val m = Mp3Parser.parseMp3(stream(f, f, "APETAGEX trailer".getBytes)).get
    assert(m.frames === 2)
  }

  test("malformed inputs return None, never throw; fuzz totality") {
    assert(Mp3Parser.parseMp3(null).isEmpty)
    assert(Mp3Parser.parseMp3(Array[Byte]()).isEmpty)
    assert(Mp3Parser.parseMp3("not audio at all".getBytes).isEmpty)
    val f = frame(3, 1, 9, 0, 0, 417)
    val valid = stream(f, f, f)
    // truncation mid-frame is malformed (declared length overruns)
    for (cut <- Seq(3, 416, 417 * 2 + 10, valid.length - 1))
      assert(Mp3Parser.parseMp3(valid.take(cut)).isEmpty, s"cut $cut")
    // free-format (idx 0), bad idx 15, reserved sr, reserved version/layer
    assert(Mp3Parser.parseMp3(stream(frame(3, 1, 0, 0, 0, 417))).isEmpty)
    assert(Mp3Parser.parseMp3(stream(frame(3, 1, 15, 0, 0, 417))).isEmpty)
    assert(Mp3Parser.parseMp3(stream(frame(3, 1, 9, 3, 0, 417))).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 400) {
      val mutated = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      Mp3Parser.parseMp3(mutated) // any result — just no throw/hang
    }
  }

  test("inconsistent streams rejected: mixed version/layer or sample rate") {
    val v1 = frame(3, 1, 9, 0, 0, 417)
    val v2l3 = frame(2, 1, 5, 0, 0, 130)
    assert(Mp3Parser.parseMp3(stream(v1, v2l3)).isEmpty)
    // same version/layer, different sample rate: 48000 idx 1 → 144*128000/48000 = 384
    val sr48 = frame(3, 1, 9, 1, 0, 384)
    assert(Mp3Parser.parseMp3(stream(v1, sr48)).isEmpty)
  }

  /** Frame with side info planted at explicit bit offsets (mono: 18
    * header bits, then 59-bit granule blocks with part2_3 at +0,
    * big_values at +12, global_gain at +21 — ISO 11172-3 §2.4.1.7),
    * written by an independent bit placer. */
  private def sideFrame(
      mono: Boolean, vals: Seq[(Int, Int, Int)], frameLen: Int): Array[Byte] = {
    val out = new Array[Byte](frameLen)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte                      // MPEG-1 L3, no CRC
    out(2) = (9 << 4).toByte                  // 128 kbps, 44.1 kHz
    out(3) = (if (mono) 0xc0 else 0x00).toByte
    val nch = if (mono) 1 else 2
    val headerBits = 9 + (if (mono) 5 else 3) + 4 * nch
    def put(bitOff: Int, width: Int, value: Int): Unit =
      for (i <- 0 until width if ((value >> (width - 1 - i)) & 1) != 0) {
        val pos = bitOff + i
        out(4 + (pos >> 3)) = (out(4 + (pos >> 3)) | (1 << (7 - (pos & 7)))).toByte
      }
    vals.zipWithIndex.foreach { case ((p23, bv, gain), slot) =>
      val base = headerBits + slot * 59
      put(base, 12, p23); put(base + 12, 9, bv); put(base + 21, 8, gain)
    }
    out
  }

  test("parseGranules: mono and stereo side info recovered bit-exactly") {
    // mono: 2 granules; values at the extremes of their fields
    val m = sideFrame(mono = true,
      Seq((4095, 511, 255), (1, 0, 210)), 417)
    val got = Mp3Parser.parseGranules(m).get
    assert(got === Seq(
      Mp3Parser.Mp3Granule(0, 0, 0, 4095, 511, 255),
      Mp3Parser.Mp3Granule(0, 1, 0, 1, 0, 210)))
    // stereo: 4 slots in granule-major, channel-minor order
    val s = sideFrame(mono = false,
      Seq((100, 7, 1), (200, 8, 2), (300, 9, 3), (400, 10, 4)), 417)
    val gotS = Mp3Parser.parseGranules(s).get
    assert(gotS === Seq(
      Mp3Parser.Mp3Granule(0, 0, 0, 100, 7, 1),
      Mp3Parser.Mp3Granule(0, 0, 1, 200, 8, 2),
      Mp3Parser.Mp3Granule(0, 1, 0, 300, 9, 3),
      Mp3Parser.Mp3Granule(0, 1, 1, 400, 10, 4)))
    // multi-frame: frame indices advance
    val two = stream(m, m)
    assert(Mp3Parser.parseGranules(two).get.map(_.frameIdx) === Seq(0, 0, 1, 1))
  }

  test("parseGranules: CRC-protected, non-L3, and malformed inputs -> None") {
    val crc = sideFrame(mono = true, Seq((1, 1, 1), (1, 1, 1)), 417)
    crc(1) = 0xfa.toByte // protection bit 0 = CRC present
    assert(Mp3Parser.parseGranules(crc).isEmpty)
    val l2 = frame(3, 2, 5, 0, 0, 261) // Layer II
    assert(Mp3Parser.parseGranules(l2).isEmpty)
    assert(Mp3Parser.parseGranules(null).isEmpty)
    assert(Mp3Parser.parseGranules(Array[Byte](0xff.toByte)).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val buf = Array.fill[Byte](rnd.nextInt(600))(rnd.nextInt(256).toByte)
      Mp3Parser.parseGranules(buf) // totality: no throw
    }
  }

  test("parseId3: v2.3 (plain BE sizes) and v2.4 (syncsafe) round-trip") {
    // a >127-byte title makes the size encodings DIFFER between
    // versions - a parser using the wrong rule misframes what follows
    val long = "T" * 200
    for (v24 <- Seq(false, true)) {
      val tag = Mp3Parser.buildId3(long, "Artist", "Album", v24,
        Array[Byte](0x11, 0x22))
      val m = Mp3Parser.parseId3(tag).get
      assert(m.version === (if (v24) 4 else 3))
      assert(m.title === long)
      assert(m.artist === "Artist")
      assert(m.album === "Album")
      assert(m.n_frames === 3)
    }
  }

  test("parseId3: UTF-16 text frames decode; unknown encodings skip") {
    // hand-build one UTF-16 TIT2 (enc 1, BOM) inside a v2.3 tag
    val txt = "caf\u00e9"
    val payload = 1.toByte +: txt.getBytes("UTF-16") // BOM included
    val frame = "TIT2".getBytes("ISO-8859-1") ++ Array[Byte](
      ((payload.length >> 24) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      (payload.length & 0xff).toByte, 0, 0) ++ payload
    def ss(v: Int) = Array[Byte](((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    val tag = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0, 0) ++
      ss(frame.length) ++ frame
    val m = Mp3Parser.parseId3(tag).get
    assert(m.title === txt)
    assert(m.n_frames === 1)
  }

  test("parseId3: malformed tags -> None, never a throw") {
    assert(Mp3Parser.parseId3(null).isEmpty)
    assert(Mp3Parser.parseId3("ID3".getBytes).isEmpty)
    assert(Mp3Parser.parseId3("NOPE23456789".getBytes).isEmpty)
    val good = Mp3Parser.buildId3("t", "a", "b", v24 = true, Array.empty)
    for (cut <- 0 until good.length)
      Mp3Parser.parseId3(good.take(cut)) // totality
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 300) {
      val buf = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt(256).toByte)
      Mp3Parser.parseId3(buf)
    }
  }
}
