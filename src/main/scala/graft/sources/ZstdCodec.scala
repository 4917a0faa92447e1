package graft.sources

import java.io.ByteArrayOutputStream

/**
 * Zstandard FRAME-level codec (RFC 8878 §3) — the decode-free triage
 * pass for `.zst` corpus drops, beside the TAR/ZIP censuses
 * ([[ArchiveCodec]]): web-scale text dumps ship zstd-compressed, and
 * the curation question ("how many frames/blocks, how much declared
 * content, dictionary or not, checksummed or not") is answered by the
 * frame and block HEADERS alone — no entropy decode, no dictionary,
 * O(blocks) per file with the payload bytes skipped, exactly like the
 * MP3/MP4/NAL walks.
 *
 * Parsed structure (all fixed-layout, little-endian):
 *  - magic 0xFD2FB528; skippable frames 0x184D2A5x (4-byte size,
 *    body skipped);
 *  - Frame_Header_Descriptor: FCS-size flag (bits 6-7), single-segment
 *    (bit 5), checksum (bit 2), dictionary-ID size flag (bits 0-1);
 *  - Window_Descriptor (absent when single-segment), Dictionary_ID
 *    (0/1/2/4 bytes), Frame_Content_Size (0/1/2/4/8 bytes; the 2-byte
 *    form is value+256 per spec);
 *  - blocks: 3-byte header — last-block bit, type (0 raw, 1 RLE,
 *    2 compressed, 3 reserved → malformed), 21-bit size; raw blocks
 *    carry size payload bytes, RLE exactly one;
 *  - 4-byte content checksum when flagged (skipped, not validated —
 *    triage counts it, decode would check it).
 *
 * The builder emits fully legal frames using ONLY raw + RLE blocks
 * (compression is never needed for a valid frame), which is what lets
 * the census be oracle-checked arithmetically.
 */
object ZstdCodec {

  /** Whole-stream census: zstd files legally concatenate frames. */
  final case class ZstdMeta(
      n_frames: Int, n_skippable: Int, n_blocks: Int,
      n_raw: Int, n_rle: Int, n_compressed: Int,
      content_bytes: Long, dict_id: Long, has_checksum: Boolean)

  private val Magic = 0xFD2FB528
  private def readLe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def parseZstd(bytes: Array[Byte]): Option[ZstdMeta] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      var p = 0
      val n = bytes.length
      var frames, skippable, blocks, raw, rle, compressed = 0
      var content = 0L
      var dictId = 0L
      var checksum = false
      while (p < n) {
        if (p + 4 > n) return None
        val magic = readLe32(bytes, p)
        if ((magic & 0xfffffff0L) == 0x184d2a50L) { // skippable frame
          if (p + 8 > n) return None
          val size = readLe32(bytes, p + 4)
          if (p + 8 + size > n) return None
          skippable += 1
          p += 8 + size.toInt
        } else if (magic == (Magic & 0xffffffffL)) {
          frames += 1
          p += 4
          if (p >= n) return None
          val fhd = bytes(p) & 0xff; p += 1
          val fcsFlag = fhd >>> 6
          val singleSegment = (fhd & 0x20) != 0
          val hasChecksum = (fhd & 0x04) != 0
          val didFlag = fhd & 0x03
          if ((fhd & 0x08) != 0) return None // reserved bit must be 0
          checksum ||= hasChecksum
          if (!singleSegment) { // Window_Descriptor
            if (p >= n) return None
            p += 1
          }
          val didLen = didFlag match {
            case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
          }
          if (p + didLen > n) return None
          var i = 0
          var did = 0L
          while (i < didLen) { did |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
          if (didLen > 0) dictId = did
          p += didLen
          val fcsLen = fcsFlag match {
            case 0 => if (singleSegment) 1 else 0
            case 1 => 2; case 2 => 4; case _ => 8
          }
          if (p + fcsLen > n) return None
          var fcs = 0L
          i = 0
          while (i < fcsLen) { fcs |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
          if (fcsLen == 2) fcs += 256 // §3.1.1.1.4: 2-byte form offsets
          if (fcsLen > 0) content += fcs
          p += fcsLen
          // block walk
          var last = false
          while (!last) {
            if (p + 3 > n) return None
            val hdr = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
              ((bytes(p + 2) & 0xff) << 16)
            p += 3
            last = (hdr & 1) != 0
            val typ = (hdr >>> 1) & 3
            val size = hdr >>> 3
            blocks += 1
            typ match {
              case 0 => raw += 1; if (p + size > n) return None; p += size
              case 1 => rle += 1; if (p + 1 > n) return None; p += 1
              case 2 => compressed += 1; if (p + size > n) return None; p += size
              case _ => return None // reserved
            }
          }
          if (hasChecksum) {
            if (p + 4 > n) return None
            p += 4
          }
        } else return None
      }
      if (frames == 0) return None // skippable-only stream carries nothing
      Some(ZstdMeta(frames, skippable, blocks, raw, rle, compressed,
        content, dictId, checksum))
    } catch { case _: Exception => None }
  }

  /** Build a legal single zstd frame over `content` split into raw
    * blocks of `blockSize`, with an optional trailing RLE block
    * (`rleLen` copies of `rleByte`), an optional 2-byte dictionary id,
    * and a declared 4-byte Frame_Content_Size. */
  def buildZstd(content: Array[Byte], blockSize: Int,
      rleLen: Int = 0, rleByte: Byte = 0x61,
      dictId: Int = 0): Array[Byte] = {
    require(blockSize > 0, "blockSize must be positive")
    require(content.length > 0 || rleLen > 0, "frame needs >= 1 block")
    require(dictId == 0 || (dictId > 0 && dictId <= 0xffff), "2-byte dict id")
    val bos = new ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >>> 8) & 0xff).toInt)
      bos.write(((v >>> 16) & 0xff).toInt); bos.write(((v >>> 24) & 0xff).toInt)
    }
    le32(Magic & 0xffffffffL)
    // FHD: FCS flag = 2 (4-byte), no single-segment, no checksum,
    // dict-id flag 2 (2 bytes) when a dictionary id is declared
    bos.write(0x80 | (if (dictId > 0) 2 else 0))
    bos.write(0x58) // Window_Descriptor: any legal exponent/mantissa
    if (dictId > 0) { bos.write(dictId & 0xff); bos.write((dictId >>> 8) & 0xff) }
    le32(content.length.toLong + rleLen)
    val nRaw = (content.length + blockSize - 1) / blockSize
    var b = 0
    while (b < nRaw) {
      val off = b * blockSize
      val len = math.min(blockSize, content.length - off)
      val isLast = b == nRaw - 1 && rleLen == 0
      val hdr = (len << 3) | (0 << 1) | (if (isLast) 1 else 0)
      bos.write(hdr & 0xff); bos.write((hdr >>> 8) & 0xff); bos.write((hdr >>> 16) & 0xff)
      bos.write(content, off, len)
      b += 1
    }
    if (rleLen > 0) {
      val hdr = (rleLen << 3) | (1 << 1) | 1
      bos.write(hdr & 0xff); bos.write((hdr >>> 8) & 0xff); bos.write((hdr >>> 16) & 0xff)
      bos.write(rleByte.toInt)
    }
    bos.toByteArray
  }

  /** A skippable frame (§3.1.2) — metadata sidecar containers real
    * tools prepend; the census must count and step over them. */
  def buildSkippable(body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(0x50); bos.write(0x2a); bos.write(0x4d); bos.write(0x18)
    val n = body.length
    bos.write(n & 0xff); bos.write((n >>> 8) & 0xff)
    bos.write((n >>> 16) & 0xff); bos.write((n >>> 24) & 0xff)
    bos.write(body, 0, n)
    bos.toByteArray
  }
}
