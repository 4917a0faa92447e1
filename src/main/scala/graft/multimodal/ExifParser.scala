package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * JPEG APP1/EXIF census — the metadata pass an image training corpus
 * runs before any pixel decode: camera make, capture timestamp and,
 * critically, ORIENTATION (a pipeline that ignores tag 0x0112 trains
 * on sideways images; every public image loader special-cases it).
 * EXIF is a TIFF structure embedded in a JPEG APP1 segment (EXIF 2.3
 * spec / ISO 12234; TIFF 6.0 for the IFD layout), so the walk is:
 * JPEG markers → APP1 with the "Exif\0\0" signature → TIFF byte-order
 * mark → IFD0 entries → the 0x8769 pointer → the Exif sub-IFD.
 *
 * The parser honors the TIFF value-or-offset rule: a field whose
 * payload exceeds 4 bytes stores an OFFSET into the TIFF body (the
 * ASCII Make/DateTime fields here); SHORTs sit in the leading bytes
 * of the value field in the file's byte order. Both byte orders are
 * first-class. TOTAL: malformed/truncated/absent-EXIF input → None,
 * never a throw (the one-bad-file-kills-a-task rule).
 *
 * Decode-free triage: O(markers + IFD entries) per file, payload
 * bytes never touched — the same scaling contract as the TIFF/MP4/
 * MP3 censuses in this package.
 */
object ExifParser {

  final case class ExifMeta(
      big_endian: Boolean, orientation: Int, make: String,
      dt_original: String)

  private def w16(v: Int, be: Boolean): Array[Byte] =
    if (be) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def w32(v: Long, be: Boolean): Array[Byte] =
    if (be) Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def r16(b: Array[Byte], off: Int, be: Boolean): Int =
    if (be) ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    else ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
  private def r32(b: Array[Byte], off: Int, be: Boolean): Long =
    if (be)
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    else
      ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
        ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  /**
   * Assemble a minimal EXIF-bearing JPEG: SOI, a JFIF APP0 (so the
   * parser must SKIP a non-EXIF segment), the APP1 with IFD0
   * {Make (ASCII, offset-stored), Orientation (SHORT, in-field),
   * ExifIFDPointer} and an Exif sub-IFD {DateTimeOriginal (ASCII 20,
   * offset-stored)}, then EOI. `dtOriginal` must be the EXIF
   * "YYYY:MM:DD HH:MM:SS" shape (19 chars).
   */
  def buildJpegExif(
      orientation: Int, make: String, dtOriginal: String,
      bigEndian: Boolean): Array[Byte] = {
    require(dtOriginal.length == 19, s"EXIF datetime must be 19 chars: $dtOriginal")
    val be = bigEndian
    val makeB = make.getBytes(US_ASCII) :+ 0.toByte
    val dtB = dtOriginal.getBytes(US_ASCII) :+ 0.toByte // count 20
    def entry(tag: Int, typ: Int, count: Long, value: Array[Byte]): Array[Byte] =
      w16(tag, be) ++ w16(typ, be) ++ w32(count, be) ++ value
    // TIFF body offsets (from the byte-order mark): IFD0 at 8 with 3
    // entries (ends 8+2+36+4 = 50), sub-IFD at 50 with 1 entry (ends
    // 68), offset-stored ASCII after that. A make that fits 4 bytes
    // rides IN the value field (the TIFF rule both ways).
    val makeInField = makeB.length <= 4
    val makeValue =
      if (makeInField) makeB ++ Array.fill[Byte](4 - makeB.length)(0)
      else w32(68L, be)
    val dtOff = if (makeInField) 68L else 68L + makeB.length
    val ifd0 = w16(3, be) ++
      entry(0x010F, 2, makeB.length.toLong, makeValue) ++
      entry(0x0112, 3, 1, w16(orientation, be) ++ w16(0, be)) ++
      entry(0x8769, 4, 1, w32(50, be)) ++
      w32(0, be)
    val subIfd = w16(1, be) ++
      entry(0x9003, 2, dtB.length.toLong, w32(dtOff, be)) ++
      w32(0, be)
    val tiff = (if (be) Array[Byte]('M', 'M') else Array[Byte]('I', 'I')) ++
      w16(42, be) ++ w32(8, be) ++ ifd0 ++ subIfd ++
      (if (makeInField) Array.empty[Byte] else makeB) ++ dtB
    val app1Body = "Exif".getBytes(US_ASCII) ++ Array[Byte](0, 0) ++ tiff
    val app0Body = "JFIF".getBytes(US_ASCII) ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0 — must be skipped
    out.write(w16(app0Body.length + 2, be = true))
    out.write(app0Body)
    out.write(0xff); out.write(0xe1) // APP1/EXIF
    out.write(w16(app1Body.length + 2, be = true))
    out.write(app1Body)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Read an ASCII field honoring the value-or-offset rule; NUL and
    * trailing-space trimmed per TIFF 6.0. None if out of range. */
  private def ascii(
      tiff: Array[Byte], entryOff: Int, count: Long, be: Boolean): Option[String] = {
    val at = if (count <= 4) entryOff + 8L else r32(tiff, entryOff + 8, be)
    if (at < 0 || count < 1 || at + count > tiff.length) return None
    val raw = new String(tiff, at.toInt, count.toInt, US_ASCII)
    Some(raw.takeWhile(_ != '\u0000').reverse.dropWhile(_ == ' ').reverse)
  }

  /** Scan one IFD for the wanted tags; returns (orientation, make,
    * datetime, exifIfdOffset) — each only if present in THIS ifd. */
  private def walkIfd(
      tiff: Array[Byte], ifdOff: Long, be: Boolean):
      Option[(Option[Int], Option[String], Option[String], Option[Long])] = {
    if (ifdOff < 8 || ifdOff + 2 > tiff.length) return None
    val n = r16(tiff, ifdOff.toInt, be)
    if (n > 512 || ifdOff + 2 + n * 12L + 4 > tiff.length) return None
    var orient: Option[Int] = None
    var make: Option[String] = None
    var dt: Option[String] = None
    var sub: Option[Long] = None
    var i = 0
    while (i < n) {
      val off = ifdOff.toInt + 2 + i * 12
      val tag = r16(tiff, off, be)
      val typ = r16(tiff, off + 2, be)
      val count = r32(tiff, off + 4, be)
      tag match {
        case 0x0112 if typ == 3 && count == 1 =>
          orient = Some(r16(tiff, off + 8, be))
        case 0x010F if typ == 2 => make = ascii(tiff, off, count, be)
        case 0x9003 if typ == 2 => dt = ascii(tiff, off, count, be)
        case 0x8769 if typ == 4 && count == 1 =>
          sub = Some(r32(tiff, off + 8, be))
        case _ => ()
      }
      i += 1
    }
    Some((orient, make, dt, sub))
  }

  /**
   * Walk a JPEG's markers to its EXIF APP1 and parse IFD0 + the Exif
   * sub-IFD. None when there is no well-formed EXIF (including a
   * JPEG with only non-APP1 segments).
   */
  def parseExif(jpeg: Array[Byte]): Option[ExifMeta] = {
    if (jpeg == null || jpeg.length < 4) return None
    if ((jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return None
    try {
      var p = 2
      while (p + 4 <= jpeg.length) {
        if ((jpeg(p) & 0xff) != 0xff) return None
        val marker = jpeg(p + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / scan start
        val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > jpeg.length) return None
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
            jpeg(p + 4) == 'E' && jpeg(p + 5) == 'x' && jpeg(p + 6) == 'i' &&
            jpeg(p + 7) == 'f' && jpeg(p + 8) == 0 && jpeg(p + 9) == 0) {
          val tiff = java.util.Arrays.copyOfRange(jpeg, p + 10, p + 2 + len)
          val be =
            if (tiff.length >= 8 && tiff(0) == 'M' && tiff(1) == 'M') true
            else if (tiff.length >= 8 && tiff(0) == 'I' && tiff(1) == 'I') false
            else return None
          if (r16(tiff, 2, be) != 42) return None
          val ifd0 = r32(tiff, 4, be)
          val (o0, m0, d0, sub) = walkIfd(tiff, ifd0, be).getOrElse(return None)
          val (o1, m1, d1) = sub.flatMap(walkIfd(tiff, _, be)) match {
            case Some((a, b, c, _)) => (a, b, c)
            case None => (None, None, None)
          }
          val orient = o0.orElse(o1)
          val make = m0.orElse(m1)
          val dt = d0.orElse(d1)
          if (orient.isEmpty && make.isEmpty && dt.isEmpty) return None
          return Some(ExifMeta(be, orient.getOrElse(-1),
            make.getOrElse(""), dt.getOrElse("")))
        }
        p += 2 + len
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
