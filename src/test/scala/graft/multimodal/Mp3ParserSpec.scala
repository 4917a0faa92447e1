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
}
