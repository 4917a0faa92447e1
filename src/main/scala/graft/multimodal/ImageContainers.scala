package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * WEBP (RIFF) and TIFF container censuses — two more decode-free
 * members of the triage family (MP3 frame walk, MP4 box walk, TAR/ZIP
 * censuses): recover dimensions and structure from container HEADERS,
 * never touching compressed payload bytes. Modern crawls are full of
 * both (WEBP is the web's dominant next-gen format; TIFF dominates
 * scanned-document corpora), and a 100 TB curation pass sizes and
 * routes them long before any decoder runs.
 *
 * WEBP (RIFF container, `RIFF <size> WEBP` + fourcc chunks, each
 * word-aligned): dimensions live in the first image chunk's header —
 *  - `VP8L` (lossless): signature byte 0x2f then a little-endian
 *    bitstream: 14-bit width−1, 14-bit height−1, 1 alpha bit, 3
 *    version bits;
 *  - `VP8 ` (lossy): 3-byte frame tag, start code 9d 01 2a, then
 *    14-bit LE width and height;
 *  - `VP8X` (extended): 4 flag bytes (bit 4 = alpha) then 24-bit LE
 *    canvas width−1 / height−1.
 * Unknown chunks (EXIF, ICCP, ...) are SKIPPED by size arithmetic —
 * the walk is O(chunks).
 *
 * TIFF: `II`/`MM` byte-order mark, magic 42, offset to the first IFD;
 * the IFD is a count + 12-byte entries (tag, type, count,
 * value-or-offset). The census reads ImageWidth (256) / ImageLength
 * (257) straight from the entry value field (SHORT value sits in the
 * leading bytes of the field, endian-dependent; LONG fills it), in
 * either byte order. O(IFD entries), payload never touched.
 *
 * Both parsers are TOTAL: any malformed/truncated input → None,
 * never a throw (the one-bad-file-kills-a-task rule).
 */
object ImageContainers {

  final case class WebpMeta(
      format: String, width: Int, height: Int, n_chunks: Int, has_alpha: Boolean)

  final case class TiffMeta(
      big_endian: Boolean, width: Long, height: Long, n_entries: Int)

  // ----------------------------------------------------------------- webp

  private def le32(v: Long): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Build a minimal lossless WEBP: RIFF/WEBP wrapper, optional EXIF
    * filler chunk (proves unknown-chunk skipping), and a VP8L chunk
    * whose header encodes the dimensions; the compressed stream body
    * is filler (the census never reads it). */
  def buildWebpLossless(
      width: Int, height: Int, alpha: Boolean,
      exifBytes: Int = 0): Array[Byte] = {
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384,
      s"VP8L dims are 14-bit: ${width}x$height")
    val chunks = new ByteArrayOutputStream()
    if (exifBytes > 0) {
      chunks.write("EXIF".getBytes(US_ASCII))
      chunks.write(le32(exifBytes.toLong))
      chunks.write(new Array[Byte](exifBytes + (exifBytes & 1))) // word pad
    }
    // VP8L header: 0x2f then LE bits [width-1:14][height-1:14][alpha:1][ver:3]
    val bits = (width - 1).toLong | ((height - 1).toLong << 14) |
      ((if (alpha) 1L else 0L) << 28)
    val vp8l = Array[Byte](0x2f) ++ le32(bits) ++ Array[Byte](0, 0, 0, 0)
    chunks.write("VP8L".getBytes(US_ASCII))
    chunks.write(le32(vp8l.length.toLong))
    chunks.write(vp8l)
    if (vp8l.length % 2 == 1) chunks.write(0)
    val body = "WEBP".getBytes(US_ASCII) ++ chunks.toByteArray
    "RIFF".getBytes(US_ASCII) ++ le32(body.length.toLong) ++ body
  }

  /** Census a WEBP image from its chunk headers. None on anything
    * malformed; unknown chunks skip by size. */
  def parseWebp(bytes: Array[Byte]): Option[WebpMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'))
      return None
    val riffEnd = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4))
    var pos = 12L
    var n = 0
    var meta: Option[WebpMeta] = None
    while (pos + 8 <= riffEnd) {
      val fourcc = new String(bytes, pos.toInt, 4, US_ASCII)
      val size = readLe32(bytes, pos.toInt + 4)
      val body = pos + 8
      if (body + size > riffEnd) return meta.map(m => m.copy(n_chunks = n))
      n += 1
      if (meta.isEmpty) fourcc match {
        case "VP8L" if size >= 5 && bytes(body.toInt) == 0x2f =>
          val bits = readLe32(bytes, body.toInt + 1)
          meta = Some(WebpMeta("VP8L",
            (bits & 0x3fff).toInt + 1, ((bits >>> 14) & 0x3fff).toInt + 1,
            0, ((bits >>> 28) & 1L) == 1L))
        case "VP8 " if size >= 10 &&
            (bytes(body.toInt + 3) & 0xff) == 0x9d &&
            (bytes(body.toInt + 4) & 0xff) == 0x01 &&
            (bytes(body.toInt + 5) & 0xff) == 0x2a =>
          val w = ((bytes(body.toInt + 6) & 0xff) |
            ((bytes(body.toInt + 7) & 0xff) << 8)) & 0x3fff
          val h = ((bytes(body.toInt + 8) & 0xff) |
            ((bytes(body.toInt + 9) & 0xff) << 8)) & 0x3fff
          meta = Some(WebpMeta("VP8", w, h, 0, has_alpha = false))
        case "VP8X" if size >= 10 =>
          val flags = bytes(body.toInt) & 0xff
          val w = ((bytes(body.toInt + 4) & 0xff) |
            ((bytes(body.toInt + 5) & 0xff) << 8) |
            ((bytes(body.toInt + 6) & 0xff) << 16)) + 1
          val h = ((bytes(body.toInt + 7) & 0xff) |
            ((bytes(body.toInt + 8) & 0xff) << 8) |
            ((bytes(body.toInt + 9) & 0xff) << 16)) + 1
          meta = Some(WebpMeta("VP8X", w, h, 0, (flags & 0x10) != 0))
        case _ => ()
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    meta.map(m => m.copy(n_chunks = n))
  }

  // ----------------------------------------------------------------- tiff

  private def w16(v: Int, be: Boolean): Array[Byte] =
    if (be) Array((v >>> 8).toByte, v.toByte) else Array(v.toByte, (v >>> 8).toByte)
  private def w32(v: Long, be: Boolean): Array[Byte] =
    if (be) Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    else le32(v)

  private def r16(b: Array[Byte], off: Int, be: Boolean): Int =
    if (be) ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def r32(b: Array[Byte], off: Int, be: Boolean): Long =
    if (be) ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    else readLe32(b, off)

  /** Build a minimal single-IFD TIFF (LONG-typed dims + a compression
    * tag), in either byte order. */
  def buildTiff(width: Long, height: Long, bigEndian: Boolean): Array[Byte] = {
    val be = bigEndian
    def entry(tag: Int, typ: Int, count: Long, value: Long): Array[Byte] =
      w16(tag, be) ++ w16(typ, be) ++ w32(count, be) ++ w32(value, be)
    val entries =
      entry(256, 4, 1, width) ++   // ImageWidth, LONG
        entry(257, 4, 1, height) ++ // ImageLength, LONG
        entry(259, 3, 1, 1L << (if (be) 16 else 0)) // Compression=1, SHORT in value field
    val ifd = w16(3, be) ++ entries ++ w32(0, be) // 3 entries, no next IFD
    (if (be) Array[Byte]('M', 'M') else Array[Byte]('I', 'I')) ++
      w16(42, be) ++ w32(8, be) ++ ifd
  }

  /** Census a TIFF from its first IFD: dimensions (SHORT or LONG
    * entries, either byte order) + entry count. None on malformed. */
  def parseTiff(bytes: Array[Byte]): Option[TiffMeta] = {
    if (bytes == null || bytes.length < 8) return None
    val be =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return None
    if (r16(bytes, 2, be) != 42) return None
    val ifdOff = r32(bytes, 4, be)
    if (ifdOff < 8 || ifdOff + 2 > bytes.length) return None
    val n = r16(bytes, ifdOff.toInt, be)
    if (ifdOff + 2 + n * 12L + 4 > bytes.length) return None
    var width = -1L
    var height = -1L
    var i = 0
    while (i < n) {
      val off = ifdOff.toInt + 2 + i * 12
      val tag = r16(bytes, off, be)
      val typ = r16(bytes, off + 2, be)
      // SHORT (3) sits in the leading 2 bytes of the value field in
      // the file's byte order; LONG (4) fills all 4
      val value =
        if (typ == 3) r16(bytes, off + 8, be).toLong
        else if (typ == 4) r32(bytes, off + 8, be)
        else -1L
      if (tag == 256) width = value
      else if (tag == 257) height = value
      i += 1
    }
    if (width < 0 || height < 0) None
    else Some(TiffMeta(be, width, height, n))
  }
}
