package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC/OGG censuses: build→parse round trips, bit-field boundaries
  * (20-bit rate, 36-bit sample count, 8 channels, 32 bps), multi-block
  * skipping, hand-assembled page/block vectors, flag semantics, and
  * garbage/truncation totality. */
class AudioContainersSpec extends AnyFunSuite {
  import AudioContainers._

  test("flac: STREAMINFO round trip and duration arithmetic") {
    for ((rate, ch, bps, n) <- Seq(
        (44100, 2, 16, 44100L * 3 + 7),
        (8000, 1, 8, 0L),
        (192000, 8, 32, 123456789L))) {
      val m = parseFlac(buildFlac(rate, ch, bps, n)).get
      assert(m === FlacMeta(rate, ch, bps, n, 1, n * 1000L / rate))
    }
  }

  test("flac: bit-field boundaries — 20-bit rate, 36-bit samples") {
    val top = parseFlac(buildFlac((1 << 20) - 1, 8, 32, (1L << 36) - 1)).get
    assert(top.sample_rate === (1 << 20) - 1)
    assert(top.total_samples === (1L << 36) - 1)
    val bot = parseFlac(buildFlac(1, 1, 4, 1L)).get
    assert(bot === FlacMeta(1, 1, 4, 1L, 1, 1000L))
  }

  test("flac: PADDING block is skipped by length and counted") {
    val m = parseFlac(buildFlac(48000, 2, 24, 48000L, paddingBytes = 129)).get
    assert(m === FlacMeta(48000, 2, 24, 48000L, 2, 1000L))
  }

  test("flac: STREAMINFO after an unknown leading block still found") {
    // hand-assemble: magic, APPLICATION block (type 2, not last), then
    // a last STREAMINFO — decoders must not assume STREAMINFO is first
    val si = buildFlac(22050, 1, 16, 22050L).drop(4) // header+34 bytes, last flag set
    val app = Array[Byte](0x02, 0, 0, 3, 1, 2, 3)
    val bytes = "fLaC".getBytes("US-ASCII") ++ app ++ si
    assert(parseFlac(bytes) === Some(FlacMeta(22050, 1, 16, 22050L, 2, 1000L)))
  }

  test("flac: totality — garbage, truncation, zero rate, short STREAMINFO") {
    assert(parseFlac(null) === None)
    assert(parseFlac("fLa".getBytes("US-ASCII")) === None)
    assert(parseFlac("OggS".getBytes("US-ASCII") ++ new Array[Byte](40)) === None)
    val ok = buildFlac(44100, 2, 16, 1000L)
    for (n <- Seq(4, 7, 20, ok.length - 1))
      assert(parseFlac(java.util.Arrays.copyOf(ok, n)) === None)
    // zero sample rate is spec-invalid for audio
    val z = ok.clone()
    // packed group starts at 4 (magic) + 4 (block hdr) + 10 → zero the
    // top 20 bits (rate) of the 64-bit group
    z(18) = 0; z(19) = 0; z(20) = (z(20) & 0x0f).toByte
    assert(parseFlac(z) === None)
    val short = "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0, 10) ++
      new Array[Byte](10)
    assert(parseFlac(short) === None)
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 5, 50, 400))
      parseFlac(Array.fill[Byte](n)(rnd.nextInt().toByte)) // must not throw
  }

  test("ogg: vorbis round trip — pages, flags, granule, duration") {
    val m = parseOgg(buildOggVorbis(2, 44100L, nAudioPages = 3,
      lastGranule = 44100L * 5 + 3)).get
    assert(m === OggMeta("vorbis", 2, 44100L, 4, 44100L * 5 + 3,
      (44100L * 5 + 3) * 1000L / 44100L))
  }

  test("ogg: single audio page, 255-channel and 32-bit-rate boundaries") {
    val m = parseOgg(buildOggVorbis(255, 0xfffffffeL, 1, 10L)).get
    assert(m.channels === 255)
    assert(m.sample_rate === 0xfffffffeL)
    assert(m.n_pages === 2)
    assert(m.duration_ms === 10L * 1000L / 0xfffffffeL)
  }

  test("ogg: multi-segment lacing (payload > 255 bytes) walks correctly") {
    // a BOS ident page followed by one EOS page with a 600-byte payload
    // → 3 lacing segments (255, 255, 90); the walk must sum them
    val ident = buildOggVorbis(1, 8000L, 1, 100L)
    // rebuild manually: take the BOS page, append a big EOS page
    val bosLen = ident.indexOfSlice("OggS".getBytes("US-ASCII"), 4)
    val bos = ident.take(bosLen)
    val big = {
      val payload = Array.fill[Byte](600)(0x77)
      val lacing = Array[Byte](255.toByte, 255.toByte, 90)
      "OggS".getBytes("US-ASCII") ++ Array[Byte](0, 0x04) ++
        Array.fill[Byte](8)(0) ++ Array.fill[Byte](12)(0) ++
        Array[Byte](3) ++ lacing ++ payload
    }
    val m = parseOgg(bos ++ big).get
    assert(m.n_pages === 2 && m.codec === "vorbis")
  }

  test("ogg: non-vorbis BOS payload reports unknown codec, zero duration") {
    val ident = buildOggVorbis(1, 8000L, 1, 80000L)
    val broken = ident.clone()
    // corrupt the \x01vorbis signature inside the BOS payload
    val sig = ident.indexOfSlice("vorbis".getBytes("US-ASCII"))
    broken(sig) = 'x'
    val m = parseOgg(broken).get
    assert(m === OggMeta("unknown", 0, 0L, 2, 80000L, 0L))
  }

  test("ogg: totality — no BOS, no EOS, truncation, garbage") {
    val ok = buildOggVorbis(2, 48000L, 2, 1000L)
    assert(parseOgg(null) === None)
    assert(parseOgg(ok.take(26)) === None)
    for (n <- Seq(27, ok.length - 1))
      assert(parseOgg(java.util.Arrays.copyOf(ok, n)) === None)
    val noBos = ok.clone(); noBos(5) = 0 // clear BOS flag on first page
    assert(parseOgg(noBos) === None)
    // drop the final (EOS) page → walk succeeds but stream incomplete
    val lastPage = ok.lastIndexOfSlice("OggS".getBytes("US-ASCII"))
    assert(parseOgg(ok.take(lastPage)) === None)
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 27, 100, 900))
      parseOgg(Array.fill[Byte](n)(rnd.nextInt().toByte)) // must not throw
  }
}
