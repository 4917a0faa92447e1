package graft.sources

import java.io.ByteArrayOutputStream

/**
 * LZ4 Frame codec (lz4_Frame_format v1.6.x) — with [[ZstdCodec]] this
 * completes the modern storage-codec triage pair for corpus drops.
 * Unlike the zstd walk, LZ4's integrity surface is fully checkable
 * without any entropy coding: the frame's header checksum and the
 * optional block/content checksums are XXH32 — implemented here for
 * real (public algorithm, Collet's reference layout), so the census
 * VALIDATES structure instead of just skipping bytes:
 *
 *  - magic 0x184D2204; skippable frames 0x184D2A5x (4-byte size);
 *  - FLG/BD descriptor: version bits must be 01; content-size,
 *    dict-id, block-checksum, content-checksum flags; block max-size
 *    code 4-7 → 64 KB..4 MB;
 *  - HC byte = (XXH32(descriptor, 0) >>> 8) & 0xFF — a mismatch means
 *    the SIZES cannot be trusted, so the parse refuses (None);
 *  - blocks: 4-byte LE size, high bit = uncompressed; 0 = EndMark;
 *    per-block XXH32 when flagged (validated);
 *  - trailing content XXH32 when flagged: VALIDATED against the
 *    concatenated uncompressed payload — a mismatch keeps the census
 *    (structure was walkable) but reports content_ok = false.
 *
 * The builder emits fully legal frames using ONLY uncompressed blocks
 * (the format explicitly allows them), with REAL checksums — which is
 * what lets a census over in-plan fixtures assert content_ok
 * arithmetically.
 */
object Lz4Codec {

  /** Whole-stream census (frames concatenate). `content_bytes` sums
    * declared content sizes; `block_max_kb` reports the LAST frame's
    * block max-size; `content_ok` is false iff any flagged content
    * checksum failed. */
  final case class Lz4Meta(
      n_frames: Int, n_skippable: Int, n_blocks: Int,
      n_uncompressed: Int, n_compressed: Int,
      content_bytes: Long, block_max_kb: Int, dict_id: Long,
      content_ok: Boolean)

  // ---------------------------------------------------------- XXH32
  private val P1 = 0x9e3779b1
  private val P2 = 0x85ebca77
  private val P3 = 0xc2b2ae3d
  private val P4 = 0x27d4eb2f
  private val P5 = 0x165667b1

  private def rotl(x: Int, r: Int): Int = Integer.rotateLeft(x, r)
  private def le32i(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** XXH32 one-shot (Collet's reference algorithm, 32-bit wrapping). */
  def xxh32(b: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    var p = off
    val end = off + len
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        val limit = end - 16
        while (p <= limit) {
          v1 = rotl(v1 + le32i(b, p) * P2, 13) * P1; p += 4
          v2 = rotl(v2 + le32i(b, p) * P2, 13) * P1; p += 4
          v3 = rotl(v3 + le32i(b, p) * P2, 13) * P1; p += 4
          v4 = rotl(v4 + le32i(b, p) * P2, 13) * P1; p += 4
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (p + 4 <= end) { h = rotl(h + le32i(b, p) * P3, 17) * P4; p += 4 }
    while (p < end) { h = rotl(h + (b(p) & 0xff) * P5, 11) * P1; p += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  private val Magic = 0x184d2204

  def parseLz4(bytes: Array[Byte]): Option[Lz4Meta] = {
    if (bytes == null || bytes.length < 7) return None
    try {
      var p = 0
      val n = bytes.length
      var frames, skippable, blocks, stored, compressed = 0
      var content = 0L
      var dictId = 0L
      var blockMaxKb = 0
      var contentOk = true
      while (p < n) {
        if (p + 4 > n) return None
        val magic = le32i(bytes, p).toLong & 0xffffffffL
        if ((magic & 0xfffffff0L) == 0x184d2a50L) {
          if (p + 8 > n) return None
          val size = le32i(bytes, p + 4).toLong & 0xffffffffL
          if (p + 8 + size > n) return None
          skippable += 1
          p += 8 + size.toInt
        } else if (magic == (Magic.toLong & 0xffffffffL)) {
          frames += 1
          p += 4
          val descStart = p
          if (p + 2 > n) return None
          val flg = bytes(p) & 0xff
          val bd = bytes(p + 1) & 0xff
          p += 2
          if ((flg >>> 6) != 1) return None // version must be 01
          if ((flg & 0x02) != 0) return None // reserved bit
          val hasBChk = (flg & 0x10) != 0
          val hasCSize = (flg & 0x08) != 0
          val hasCChk = (flg & 0x04) != 0
          val hasDict = (flg & 0x01) != 0
          val bmCode = (bd >>> 4) & 0x07
          if (bmCode < 4 || (bd & 0x8f) != 0) return None // reserved bits
          blockMaxKb = 64 << (2 * (bmCode - 4)) // 4→64KB ... 7→4MB
          var csize = -1L
          if (hasCSize) {
            if (p + 8 > n) return None
            var i = 0; var v = 0L
            while (i < 8) { v |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
            csize = v; p += 8
          }
          if (hasDict) {
            if (p + 4 > n) return None
            dictId = le32i(bytes, p).toLong & 0xffffffffL
            p += 4
          }
          if (p >= n) return None
          val hc = bytes(p) & 0xff
          // header checksum protects the SIZES: a mismatch refuses
          if (((xxh32(bytes, descStart, p - descStart, 0) >>> 8) & 0xff) != hc)
            return None
          p += 1
          if (csize >= 0) content += csize
          // payload accumulates only when a content checksum must be
          // validated (uncompressed blocks make that possible here)
          val payload = if (hasCChk) new ByteArrayOutputStream() else null
          var decodable = true
          var endMark = false
          while (!endMark) {
            if (p + 4 > n) return None
            val raw = le32i(bytes, p)
            p += 4
            if (raw == 0) endMark = true
            else {
              val size = raw & 0x7fffffff
              val isStored = (raw & 0x80000000) != 0
              if (p + size > n || size > blockMaxKb * 1024) return None
              blocks += 1
              if (isStored) {
                stored += 1
                if (payload != null) payload.write(bytes, p, size)
              } else {
                compressed += 1
                decodable = false // would need the sequence decoder
              }
              p += size
              if (hasBChk) {
                if (p + 4 > n) return None
                // block checksum covers the raw block bytes
                if (le32i(bytes, p) != xxh32(bytes, p - size, size, 0))
                  contentOk = false
                p += 4
              }
            }
          }
          if (hasCChk) {
            if (p + 4 > n) return None
            val got = le32i(bytes, p)
            p += 4
            if (decodable) {
              val buf = payload.toByteArray
              if (xxh32(buf, 0, buf.length, 0) != got) contentOk = false
              if (csize >= 0 && buf.length.toLong != csize) contentOk = false
            }
          }
        } else return None
      }
      if (frames == 0) return None
      Some(Lz4Meta(frames, skippable, blocks, stored, compressed,
        content, blockMaxKb, dictId, contentOk))
    } catch { case _: Exception => None }
  }

  /** Build a legal frame over `content` split into UNCOMPRESSED
    * blocks of `blockSize`, with declared content size, real XXH32
    * header + content checksums, optional per-block checksums and a
    * 4-byte dictionary id. */
  def buildLz4(content: Array[Byte], blockSize: Int,
      blockChecksums: Boolean = false, dictId: Long = 0,
      bmCode: Int = 7): Array[Byte] = {
    require(blockSize > 0 && blockSize <= (64 << (2 * (bmCode - 4))) * 1024,
      "blockSize within block max size")
    require(bmCode >= 4 && bmCode <= 7, "block max-size code 4-7")
    val bos = new ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >>> 8) & 0xff).toInt)
      bos.write(((v >>> 16) & 0xff).toInt); bos.write(((v >>> 24) & 0xff).toInt)
    }
    le32(Magic.toLong)
    val desc = new ByteArrayOutputStream()
    // FLG: version 01, B.Indep, C.Size, C.Checksum (+B.Checksum/dict)
    desc.write(0x40 | 0x20 | 0x08 | 0x04 |
      (if (blockChecksums) 0x10 else 0) | (if (dictId != 0) 0x01 else 0))
    desc.write(bmCode << 4)
    var i = 0
    while (i < 8) { desc.write(((content.length.toLong >>> (8 * i)) & 0xff).toInt); i += 1 }
    if (dictId != 0) {
      i = 0
      while (i < 4) { desc.write(((dictId >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    val d = desc.toByteArray
    bos.write(d, 0, d.length)
    bos.write((xxh32(d, 0, d.length, 0) >>> 8) & 0xff)
    var off = 0
    while (off < content.length) {
      val len = math.min(blockSize, content.length - off)
      le32((len.toLong | 0x80000000L) & 0xffffffffL) // high bit: stored
      bos.write(content, off, len)
      if (blockChecksums) le32(xxh32(content, off, len, 0).toLong & 0xffffffffL)
      off += len
    }
    le32(0L) // EndMark
    le32(xxh32(content, 0, content.length, 0).toLong & 0xffffffffL)
    bos.toByteArray
  }

  /** A skippable frame — same framing as [[ZstdCodec.buildSkippable]]
    * but with the LZ4-family magic (0x184D2A50). */
  def buildSkippable(body: Array[Byte]): Array[Byte] =
    ZstdCodec.buildSkippable(body)
}
