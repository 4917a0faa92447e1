package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

/**
 * Pure-Scala archive codecs — TAR (POSIX ustar) and ZIP — for the
 * decode-free CENSUS pass a code/document corpus needs when it
 * arrives as archives (GitHub dumps, Kaggle datasets, institutional
 * drops are tars and zips, the way crawls are WARCs). Census =
 * enumerate every member's name/size/kind WITHOUT touching payload
 * bytes, the same triage discipline as the MP3 frame walk and MP4 box
 * walker: at 100 TB you size, filter, and route archives long before
 * you extract them.
 *
 * Read-side scale shape: archives on disk ⇒ `binaryFile` scan ⇒ one
 * census call per file inside `flatMap` — partition-parallel,
 * shuffle-free. The ZIP census reads ONLY the end-of-central-
 * directory record and the central directory (O(members), found from
 * the file tail), never the file bodies; the TAR census walks header
 * blocks and SKIPS payloads by arithmetic. Both are total: malformed
 * or truncated input yields the members before the damage, never a
 * throw.
 *
 * Out-of-scope, documented: tar PAX/GNU long-name extensions (the
 * 'x'/'L' payload-encoded names — entries surface under their
 * typeflag but names stay as the header's 100-byte field) and ZIP64
 * (the census reports what the 32-bit EOCD covers). Neither occurs
 * in the build side here, and both degrade to partial-census, not
 * failure.
 *
 * The write side exists to round-trip-prove the parsers on corpus
 * data (driver rows `tar_census` / `zip_census`: documents → sharded
 * archives → census → closed-form size oracle) and to export corpora
 * in the ecosystem's interchange formats. ZIP entries are STORED
 * (method 0): the archive is a container here, not a compressor —
 * parquet/zstd already owns compression — and STORED keeps the build
 * byte-deterministic.
 */
object ArchiveCodec {

  /** One tar member: header name, payload size, the typeflag byte as a
    * string ("0" regular file, "5" directory, "L"/"x" extensions), and
    * mtime (epoch seconds, from the octal header field). */
  final case class TarEntry(name: String, size: Long, type_flag: String, mtime: Long)

  /** One zip member as recorded in the central directory: name,
    * compression method (0 = STORED, 8 = DEFLATE), compressed and
    * uncompressed sizes, and the archive's CRC-32 of the payload. */
  final case class ZipEntry(
      name: String, method: Int, csize: Long, usize: Long, crc32: Long)

  // ------------------------------------------------------------------ tar

  private val Block = 512

  /** Write one octal header field: value in ASCII octal, NUL-padded to
    * `width` with a trailing NUL terminator (the ustar convention). */
  private def octal(buf: Array[Byte], off: Int, width: Int, value: Long): Unit = {
    val s = java.lang.Long.toOctalString(value)
    val digits = s.length.min(width - 1)
    val start = off + (width - 1 - digits)
    var i = 0
    while (i < digits) {
      buf(start + i) = s.charAt(s.length - digits + i).toByte
      i += 1
    }
    var p = off
    while (p < start) { buf(p) = '0'; p += 1 }
  }

  /** One ustar header block for a regular file. */
  private def tarHeader(name: String, size: Long, mtime: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes(UTF_8)
    require(nameB.length <= 100, s"tar name over 100 bytes: $name")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    octal(h, 100, 8, 420)        // mode 0644
    octal(h, 108, 8, 0)          // uid
    octal(h, 116, 8, 0)          // gid
    octal(h, 124, 12, size)
    octal(h, 136, 12, mtime)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                 // typeflag: regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5)
    h(262) = 0; h(263) = '0'; h(264) = '0' // magic NUL + version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    octal(h, 148, 7, sum)        // 6 digits + NUL, then the space at 155
    h(155) = ' '
    h
  }

  /** Build a tar image: one regular-file member per (name, payload),
    * payloads NUL-padded to 512-byte blocks, two zero blocks at the
    * end. Deterministic byte-for-byte given the input order. */
  def buildTar(
      members: Iterator[(String, Array[Byte])], mtime: Long = 0L): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      out.write(tarHeader(name, payload.length.toLong, mtime))
      out.write(payload)
      val pad = (Block - payload.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  private def parseOctal(buf: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = off
    val end = off + width
    while (i < end) {
      val c = buf(i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); i += 1 }
      else i = end
    }
    v
  }

  private def nulString(buf: Array[Byte], off: Int, width: Int): String = {
    var end = off
    val max = off + width
    while (end < max && buf(end) != 0) end += 1
    new String(buf, off, end - off, UTF_8)
  }

  /** Census-walk a tar image: every member's header fields, payloads
    * skipped by size arithmetic (never scanned). Stops at the
    * end-of-archive zero block, a checksum mismatch, or truncation —
    * returning the members before the damage. */
  def parseTar(bytes: Array[Byte]): Seq[TarEntry] = {
    if (bytes == null) return Seq.empty
    val out = Seq.newBuilder[TarEntry]
    var pos = 0
    var ok = true
    while (ok && pos + Block <= bytes.length) {
      var allZero = true
      var i = 0
      while (allZero && i < Block) { if (bytes(pos + i) != 0) allZero = false; i += 1 }
      if (allZero) ok = false // end-of-archive marker
      else {
        // verify the header checksum: unsigned byte sum with the
        // chksum field treated as spaces — rejects garbage blocks so a
        // corrupt size field cannot send the walk off the rails
        var sum = 0L
        i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
          i += 1
        }
        if (sum != parseOctal(bytes, pos + 148, 8)) ok = false
        else {
          val size = parseOctal(bytes, pos + 124, 12)
          val entry = TarEntry(
            nulString(bytes, pos, 100), size,
            (if (bytes(pos + 156) == 0) "0" else bytes(pos + 156).toChar.toString),
            parseOctal(bytes, pos + 136, 12))
          val dataBlocks = (size + Block - 1) / Block
          val next = pos.toLong + Block + dataBlocks * Block
          if (next > bytes.length) ok = false // truncated payload
          else { out += entry; pos = next.toInt }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------ zip

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Build a zip image with STORED entries (APPNOTE 4.4.x layout:
    * local headers + payloads, central directory, EOCD). Deterministic
    * byte-for-byte given the input order; all timestamps zero. */
  def buildZip(members: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val central = new ByteArrayOutputStream()
    var count = 0
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes(UTF_8)
      val offset = out.size()
      val crc = new CRC32()
      crc.update(payload)
      val crcV = crc.getValue
      // local file header
      out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04))
      out.write(le16(20)); out.write(le16(0))      // version 2.0, flags
      out.write(le16(0))                           // method STORED
      out.write(le16(0)); out.write(le16(0))       // mod time/date
      out.write(le32(crcV))
      out.write(le32(payload.length.toLong))       // csize = usize (STORED)
      out.write(le32(payload.length.toLong))
      out.write(le16(nameB.length)); out.write(le16(0)) // name len, extra len
      out.write(nameB)
      out.write(payload)
      // central directory record
      central.write(Array[Byte](0x50, 0x4b, 0x01, 0x02))
      central.write(le16(20)); central.write(le16(20)) // made-by, needed
      central.write(le16(0)); central.write(le16(0))   // flags, method
      central.write(le16(0)); central.write(le16(0))   // time, date
      central.write(le32(crcV))
      central.write(le32(payload.length.toLong))
      central.write(le32(payload.length.toLong))
      central.write(le16(nameB.length))
      central.write(le16(0)); central.write(le16(0))   // extra, comment
      central.write(le16(0)); central.write(le16(0))   // disk, int attrs
      central.write(le32(0L))                          // ext attrs
      central.write(le32(offset.toLong))
      central.write(nameB)
      count += 1
    }
    val cdOffset = out.size()
    central.writeTo(out)
    val cdSize = out.size() - cdOffset
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06))    // EOCD
    out.write(le16(0)); out.write(le16(0))            // disk numbers
    out.write(le16(count)); out.write(le16(count))
    out.write(le32(cdSize.toLong))
    out.write(le32(cdOffset.toLong))
    out.write(le16(0))                                // comment length
    out.toByteArray
  }

  /** Census a zip image from its central directory ONLY: locate the
    * EOCD by scanning back from the tail (it floats over a variable
    * comment, APPNOTE 4.3.16), then walk the directory records —
    * O(members) work regardless of payload bytes, which is the whole
    * point of a directory-bearing format. Total: missing/corrupt
    * EOCD → empty; a malformed record ends the walk with the members
    * before it. */
  def parseZip(bytes: Array[Byte]): Seq[ZipEntry] = {
    if (bytes == null || bytes.length < 22) return Seq.empty
    // EOCD scan: last 64 KB + 22 (max comment 65535)
    var eocd = -1
    var p = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (bytes(p) == 0x50 && bytes(p + 1) == 0x4b &&
        bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06) eocd = p
      else p -= 1
    }
    if (eocd < 0) return Seq.empty
    val count = readLe16(bytes, eocd + 10)
    var pos = readLe32(bytes, eocd + 16).toInt // central directory offset
    val out = Seq.newBuilder[ZipEntry]
    var i = 0
    var ok = true
    while (ok && i < count) {
      if (pos < 0 || pos + 46 > bytes.length ||
        !(bytes(pos) == 0x50 && bytes(pos + 1) == 0x4b &&
          bytes(pos + 2) == 0x01 && bytes(pos + 3) == 0x02)) ok = false
      else {
        val nameLen = readLe16(bytes, pos + 28)
        val extraLen = readLe16(bytes, pos + 30)
        val commentLen = readLe16(bytes, pos + 32)
        if (pos + 46 + nameLen > bytes.length) ok = false
        else {
          out += ZipEntry(
            new String(bytes, pos + 46, nameLen, UTF_8),
            readLe16(bytes, pos + 10),
            readLe32(bytes, pos + 20),
            readLe32(bytes, pos + 24),
            readLe32(bytes, pos + 16))
          pos += 46 + nameLen + extraLen + commentLen
          i += 1
        }
      }
    }
    out.result()
  }
}
