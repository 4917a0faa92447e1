package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Zstd frame census: builder round trip over a parameter grid, the
  * 2-byte FCS offset, checksum skip, frame concatenation, and fuzz
  * totality. */
class ZstdCodecSpec extends AnyFunSuite {

  private def content(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + 7) % 251).toByte)

  test("builder round trip recovers frame/block census and declared size") {
    for {
      clen <- Seq(1, 63, 64, 65, 1000)
      bs <- Seq(1, 7, 64)
      rleLen <- Seq(0, 5)
      dictId <- Seq(0, 0x1234)
    } {
      val m = ZstdCodec.parseZstd(
        ZstdCodec.buildZstd(content(clen), bs, rleLen, 0x41, dictId)).get
      val nRaw = (clen + bs - 1) / bs
      assert(m.n_frames === 1 && m.n_skippable === 0)
      assert(m.n_raw === nRaw)
      assert(m.n_rle === (if (rleLen > 0) 1 else 0))
      assert(m.n_blocks === nRaw + (if (rleLen > 0) 1 else 0))
      assert(m.n_compressed === 0)
      assert(m.content_bytes === clen.toLong + rleLen)
      assert(m.dict_id === dictId.toLong)
      assert(!m.has_checksum)
    }
  }

  test("skippable frames are counted and stepped over; frames concatenate") {
    val stream = ZstdCodec.buildSkippable(content(17)) ++
      ZstdCodec.buildZstd(content(100), 32) ++
      ZstdCodec.buildSkippable(Array.empty[Byte]) ++
      ZstdCodec.buildZstd(content(10), 10, rleLen = 3)
    val m = ZstdCodec.parseZstd(stream).get
    assert(m.n_frames === 2 && m.n_skippable === 2)
    assert(m.content_bytes === 113L)
    assert(m.n_raw === 4 + 1 && m.n_rle === 1)
  }

  test("2-byte FCS form carries the +256 spec offset") {
    // magic, FHD: FCS flag 1 (0x40), window, FCS LE = 2 → 258 declared,
    // one last RLE block of 258 bytes
    val frame = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x40, 0x58, 0x02, 0x00,
      ((258 << 3) | 2 | 1).toByte, (((258 << 3) | 3) >>> 8).toByte,
      (((258 << 3) | 3) >>> 16).toByte, 0x61)
    val m = ZstdCodec.parseZstd(frame).get
    assert(m.content_bytes === 258L)
    assert(m.n_rle === 1)
  }

  test("content-checksum flag is censused and its 4 bytes skipped") {
    // FHD 0x44: FCS flag 1 + checksum bit; RLE last block; 4 tail bytes
    val frame = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x44, 0x58, 0x00, 0x00,
      ((5 << 3) | 2 | 1).toByte, 0, 0, 0x62,
      0x11, 0x22, 0x33, 0x44)
    val m = ZstdCodec.parseZstd(frame).get
    assert(m.has_checksum)
    assert(m.content_bytes === 256L) // 2-byte FCS 0 declares 256
  }

  test("malformed streams return None, never throw; fuzz totality") {
    assert(ZstdCodec.parseZstd(null).isEmpty)
    assert(ZstdCodec.parseZstd(Array.empty[Byte]).isEmpty)
    assert(ZstdCodec.parseZstd("not zstd at all".getBytes).isEmpty)
    val good = ZstdCodec.buildZstd(content(50), 16)
    // truncation at every prefix must refuse, not throw
    (0 until good.length).foreach { cut =>
      assert(ZstdCodec.parseZstd(good.take(cut)).isEmpty, s"prefix $cut")
    }
    // reserved block type (3)
    val reserved = good.clone()
    reserved(10) = (reserved(10) | 0x06).toByte
    assert(ZstdCodec.parseZstd(reserved).isEmpty)
    // reserved FHD bit set
    val fhdBad = good.clone(); fhdBad(4) = (fhdBad(4) | 0x08).toByte
    assert(ZstdCodec.parseZstd(fhdBad).isEmpty)
    // a skippable-only stream declares no content: refused
    assert(ZstdCodec.parseZstd(ZstdCodec.buildSkippable(content(9))).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      ZstdCodec.parseZstd(bytes)
    }
  }
}
