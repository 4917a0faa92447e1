package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 frame census: XXH32 reference vectors, builder round trip,
  * checksum validation both ways, and fuzz totality. */
class Lz4CodecSpec extends AnyFunSuite {

  private def content(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 29 + 3) % 253).toByte)

  test("XXH32 matches the reference test vectors") {
    def h(s: String): Long =
      Lz4Codec.xxh32(s.getBytes("UTF-8"), 0, s.length, 0).toLong & 0xffffffffL
    assert(h("") === 0x02cc5d05L)
    assert(h("a") === 0x550d7456L)
    assert(h("abc") === 0x32d153ffL)
    // >16 bytes exercises the 4-lane stripe path
    assert(h("abcdefghijklmnopqrstuvwxyz1234567890") !== 0L)
  }

  test("builder round trip recovers block census, sizes and checksums") {
    for {
      clen <- Seq(1, 100, 1000)
      bs <- Seq(7, 64, 1024)
      bchk <- Seq(false, true)
      dictId <- Seq(0L, 0xdeadbeefL)
      bm <- Seq(4, 7)
    } {
      val m = Lz4Codec.parseLz4(
        Lz4Codec.buildLz4(content(clen), bs, bchk, dictId, bm)).get
      assert(m.n_frames === 1 && m.n_skippable === 0)
      assert(m.n_blocks === (clen + bs - 1) / bs)
      assert(m.n_uncompressed === m.n_blocks && m.n_compressed === 0)
      assert(m.content_bytes === clen.toLong)
      assert(m.block_max_kb === (if (bm == 4) 64 else 4096))
      assert(m.dict_id === dictId)
      assert(m.content_ok, s"clen=$clen bs=$bs")
    }
  }

  test("a corrupted payload byte fails content (and block) checksum validation") {
    val good = Lz4Codec.buildLz4(content(200), 64, blockChecksums = true)
    // first block's payload starts after magic(4)+FLG/BD(2)+csize(8)+HC(1)
    // + block size word(4) = offset 19
    val bad = good.clone(); bad(25) = (bad(25) ^ 0x01).toByte
    val m = Lz4Codec.parseLz4(bad).get
    assert(!m.content_ok)
    assert(Lz4Codec.parseLz4(good).get.content_ok)
  }

  test("a corrupted header checksum refuses the frame (sizes untrusted)") {
    val good = Lz4Codec.buildLz4(content(50), 16)
    val hcOffset = 4 + 2 + 8 // magic, FLG+BD, content size; HC next
    val bad = good.clone(); bad(hcOffset) = (bad(hcOffset) ^ 0xff).toByte
    assert(Lz4Codec.parseLz4(bad).isEmpty)
  }

  test("skippable frames and concatenation census") {
    val stream = Lz4Codec.buildSkippable(content(9)) ++
      Lz4Codec.buildLz4(content(100), 32) ++
      Lz4Codec.buildLz4(content(10), 10)
    val m = Lz4Codec.parseLz4(stream).get
    assert(m.n_frames === 2 && m.n_skippable === 1)
    assert(m.content_bytes === 110L)
    assert(m.content_ok)
  }

  test("malformed streams return None, never throw; fuzz totality") {
    assert(Lz4Codec.parseLz4(null).isEmpty)
    assert(Lz4Codec.parseLz4(Array.empty[Byte]).isEmpty)
    val good = Lz4Codec.buildLz4(content(50), 16)
    (0 until good.length).foreach { cut =>
      assert(Lz4Codec.parseLz4(good.take(cut)).isEmpty, s"prefix $cut")
    }
    // version bits 10 instead of 01 (FLG at offset 4) — note the header
    // checksum is checked AFTER version, so this must refuse on version
    val badVer = good.clone(); badVer(4) = ((badVer(4) & 0x3f) | 0x80).toByte
    assert(Lz4Codec.parseLz4(badVer).isEmpty)
    // reserved BD bits
    val badBd = good.clone(); badBd(5) = (badBd(5) | 0x08).toByte
    assert(Lz4Codec.parseLz4(badBd).isEmpty)
    val rnd = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      Lz4Codec.parseLz4(bytes)
    }
  }
}
