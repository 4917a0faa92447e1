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
 * Extension coverage: tar PAX ('x') and GNU longname ('L') entries
 * are consumed as METADATA — their payload-encoded `path=` / name
 * override applies to the following member, which surfaces under its
 * real (long) name; the extension entries themselves do not appear
 * as census rows (the behavior of every tar lister). ZIP64 is read
 * on both levels: an EOCD whose count/offset saturate at 0xFFFF /
 * 0xFFFFFFFF routes through the ZIP64 EOCD locator + record
 * (APPNOTE 4.3.14-15), and per-entry 0xFFFFFFFF sizes/offsets
 * resolve from the 0x0001 extended-information extra field
 * (APPNOTE 4.5.3) — so >4 GiB members census with true sizes.
 * Remaining documented boundary: multi-disk (split) archives —
 * census returns empty rather than a wrong walk.
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

  /** One ustar header block; `typeflag` parameterized so the GNU/PAX
    * metadata entries reuse the same checksummed layout. */
  private def tarHeaderTyped(
      name: String, size: Long, mtime: Long, typeflag: Char): Array[Byte] = {
    val h = tarHeader(name, size, mtime)
    h(156) = typeflag.toByte
    // typeflag participates in the checksum: recompute
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    octal(h, 148, 7, sum)
    h(155) = ' '
    h
  }

  private def writePadded(out: ByteArrayOutputStream, payload: Array[Byte]): Unit = {
    out.write(payload)
    val pad = (Block - payload.length % Block) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Build a tar image: one regular-file member per (name, payload),
    * payloads NUL-padded to 512-byte blocks, two zero blocks at the
    * end. Names over 100 bytes are carried the GNU way — a 'L'
    * longname metadata entry (`././@LongLink`) whose payload is the
    * full name, followed by the member under the truncated header
    * name — or the PAX way (`paxLongNames = true`): an 'x' extended
    * header with a `path=` record. Deterministic byte-for-byte given
    * the input order. */
  /** Longest prefix of `name` whose UTF-8 encoding fits `maxBytes`:
    * truncate BY BYTES at a char boundary (back up over 10xxxxxx
    * continuation bytes), so re-encoding can never exceed the budget.
    * Char-count `take` or byte-split decoding both over-shoot on
    * multibyte names — a >100-byte non-ASCII member name used to make
    * buildTar throw instead of emitting the truncated header. */
  private def truncUtf8(name: String, maxBytes: Int): String = {
    val b = name.getBytes(UTF_8)
    if (b.length <= maxBytes) name
    else {
      var end = maxBytes
      while (end > 0 && (b(end) & 0xc0) == 0x80) end -= 1
      new String(b, 0, end, UTF_8)
    }
  }

  def buildTar(
      members: Iterator[(String, Array[Byte])], mtime: Long = 0L,
      paxLongNames: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes(UTF_8)
      val headerName =
        if (nameB.length <= 100) name
        else truncUtf8(name, 100) // truncated fallback field
      if (nameB.length > 100) {
        if (paxLongNames) {
          // PAX record: "<len> path=<name>\n", len = total record bytes
          val body = s" path=$name\n".getBytes(UTF_8)
          var len = body.length // grows when the length digits widen it
          while (s"$len".getBytes(UTF_8).length + body.length != len)
            len = s"$len".getBytes(UTF_8).length + body.length
          val rec = (s"$len" + new String(body, UTF_8)).getBytes(UTF_8)
          out.write(tarHeaderTyped("PaxHeaders/" +
            truncUtf8(headerName, 88), rec.length.toLong, mtime, 'x'))
          writePadded(out, rec)
        } else {
          val full = nameB :+ 0.toByte // GNU longname is NUL-terminated
          out.write(tarHeaderTyped("././@LongLink", full.length.toLong, mtime, 'L'))
          writePadded(out, full)
        }
      }
      out.write(tarHeader(headerName, payload.length.toLong, mtime))
      writePadded(out, payload)
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

  /** Parse one PAX extended-header payload ("len key=value\n" records,
    * POSIX.1-2001 pax §pax Extended Header) → the `path` override, if
    * well-formed. Records with bad lengths end the scan (best-effort
    * metadata — the member still surfaces under its header name). */
  private def paxPath(payload: Array[Byte]): Option[String] = {
    var path: Option[String] = None
    var p = 0
    var ok = true
    while (ok && p < payload.length) {
      var q = p
      while (q < payload.length && payload(q) != ' ') q += 1
      val lenStr = new String(payload, p, q - p, UTF_8)
      val len = try lenStr.toInt catch { case _: NumberFormatException => -1 }
      // a record must cover its digits + space + at least the \n:
      // len < (q-p)+2 (e.g. a crafted "2 x") would make the body
      // count negative — refuse, keeping the never-throw contract
      if (len < (q - p) + 2 || p + len > payload.length ||
        q >= payload.length) ok = false
      else {
        // record body: between the space and the trailing \n
        val body = new String(payload, q + 1, len - (q - p) - 2, UTF_8)
        val eq = body.indexOf('=')
        if (eq > 0 && body.substring(0, eq) == "path")
          path = Some(body.substring(eq + 1))
        p += len
      }
    }
    path
  }

  /** Census-walk a tar image: every member's header fields, payloads
    * skipped by size arithmetic (never scanned) — EXCEPT the PAX ('x')
    * and GNU longname ('L') metadata payloads, which are read (they
    * are names, not data) and applied to the following member; the
    * metadata entries themselves do not surface, matching tar listers.
    * Stops at the end-of-archive zero block, a checksum mismatch, or
    * truncation — returning the members before the damage. */
  def parseTar(bytes: Array[Byte]): Seq[TarEntry] = {
    if (bytes == null) return Seq.empty
    val out = Seq.newBuilder[TarEntry]
    var pos = 0
    var ok = true
    var pendingName: Option[String] = None
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
          val typeflag =
            if (bytes(pos + 156) == 0) "0" else bytes(pos + 156).toChar.toString
          val dataBlocks = (size + Block - 1) / Block
          val next = pos.toLong + Block + dataBlocks * Block
          if (next > bytes.length) ok = false // truncated payload
          else {
            typeflag match {
              case "L" => // GNU longname: payload = next member's name
                val raw = java.util.Arrays.copyOfRange(
                  bytes, pos + Block, pos + Block + size.toInt)
                val end = raw.indexOf(0.toByte)
                pendingName = Some(new String(raw, 0,
                  if (end >= 0) end else raw.length, UTF_8))
              case "x" => // PAX extended header: path= record
                pendingName = paxPath(java.util.Arrays.copyOfRange(
                  bytes, pos + Block, pos + Block + size.toInt))
                  .orElse(pendingName)
              case _ =>
                out += TarEntry(
                  pendingName.getOrElse(nulString(bytes, pos, 100)),
                  size, typeflag, parseOctal(bytes, pos + 136, 12))
                pendingName = None
            }
            pos = next.toInt
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------ zip

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => (v >>> (8 * i)).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def readLe64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Build a zip image with STORED entries (APPNOTE 4.4.x layout:
    * local headers + payloads, central directory, EOCD). Deterministic
    * byte-for-byte given the input order; all timestamps zero.
    * `forceZip64` emits the ZIP64 structures a >4 GiB archive would —
    * saturated 32-bit fields resolving through the 0x0001 extra field
    * and the ZIP64 EOCD record + locator — so the census's 64-bit
    * path is testable without writing 4 GiB. */
  def buildZip(members: Iterator[(String, Array[Byte])],
      forceZip64: Boolean = false): Array[Byte] = {
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
      out.write(le16(if (forceZip64) 45 else 20)); out.write(le16(0)) // version, flags
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
      central.write(le16(if (forceZip64) 45 else 20))
      central.write(le16(if (forceZip64) 45 else 20)) // made-by, needed
      central.write(le16(0)); central.write(le16(0))   // flags, method
      central.write(le16(0)); central.write(le16(0))   // time, date
      central.write(le32(crcV))
      if (forceZip64) {
        // saturate the 32-bit size/offset fields; real values move to
        // the 0x0001 ZIP64 extended-information extra field
        central.write(le32(0xffffffffL)) // csize
        central.write(le32(0xffffffffL)) // usize
        central.write(le16(nameB.length))
        central.write(le16(4 + 24))      // extra len: header + 3×8 bytes
        central.write(le16(0))           // comment
        central.write(le16(0)); central.write(le16(0)) // disk, int attrs
        central.write(le32(0L))          // ext attrs
        central.write(le32(0xffffffffL)) // local offset → extra field
        central.write(nameB)
        central.write(le16(1))           // extra id 0x0001
        central.write(le16(24))          // extra data size
        central.write(le64(payload.length.toLong)) // usize (APPNOTE order)
        central.write(le64(payload.length.toLong)) // csize
        central.write(le64(offset.toLong))         // local header offset
      } else {
        central.write(le32(payload.length.toLong))
        central.write(le32(payload.length.toLong))
        central.write(le16(nameB.length))
        central.write(le16(0)); central.write(le16(0))   // extra, comment
        central.write(le16(0)); central.write(le16(0))   // disk, int attrs
        central.write(le32(0L))                          // ext attrs
        central.write(le32(offset.toLong))
        central.write(nameB)
      }
      count += 1
    }
    val cdOffset = out.size()
    central.writeTo(out)
    val cdSize = out.size() - cdOffset
    if (forceZip64) {
      val z64Off = out.size()
      out.write(Array[Byte](0x50, 0x4b, 0x06, 0x06)) // ZIP64 EOCD record
      out.write(le64(44L))                           // record size (after this field)
      out.write(le16(45)); out.write(le16(45))       // made-by, needed
      out.write(le32(0L)); out.write(le32(0L))       // disk numbers
      out.write(le64(count.toLong)); out.write(le64(count.toLong))
      out.write(le64(cdSize.toLong))
      out.write(le64(cdOffset.toLong))
      out.write(Array[Byte](0x50, 0x4b, 0x06, 0x07)) // ZIP64 EOCD locator
      out.write(le32(0L))                            // disk with zip64 EOCD
      out.write(le64(z64Off.toLong))
      out.write(le32(1L))                            // total disks
      out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06)) // EOCD, saturated
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(0xffff)); out.write(le16(0xffff))
      out.write(le32(0xffffffffL))
      out.write(le32(0xffffffffL))
      out.write(le16(0))
    } else {
      out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06))  // EOCD
      out.write(le16(0)); out.write(le16(0))          // disk numbers
      out.write(le16(count)); out.write(le16(count))
      out.write(le32(cdSize.toLong))
      out.write(le32(cdOffset.toLong))
      out.write(le16(0))                              // comment length
    }
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
    var count = readLe16(bytes, eocd + 10).toLong
    var cdOffset = readLe32(bytes, eocd + 16)
    // ZIP64 (APPNOTE 4.3.14-15): saturated EOCD fields route through
    // the locator (20 bytes immediately before the EOCD) to the ZIP64
    // EOCD record's 64-bit count/offset.
    if ((count == 0xffffL || cdOffset == 0xffffffffL) && eocd >= 20 &&
      bytes(eocd - 20) == 0x50 && bytes(eocd - 19) == 0x4b &&
      bytes(eocd - 18) == 0x06 && bytes(eocd - 17) == 0x07) {
      val z64Off = readLe64(bytes, eocd - 12)
      if (z64Off >= 0 && z64Off + 56 <= bytes.length &&
        bytes(z64Off.toInt) == 0x50 && bytes(z64Off.toInt + 1) == 0x4b &&
        bytes(z64Off.toInt + 2) == 0x06 && bytes(z64Off.toInt + 3) == 0x06) {
        val z = z64Off.toInt
        count = readLe64(bytes, z + 32)     // total entries
        cdOffset = readLe64(bytes, z + 48)  // central directory offset
      } else return Seq.empty // saturated EOCD with no usable ZIP64 record
    }
    if (cdOffset < 0 || cdOffset > Int.MaxValue) return Seq.empty
    var pos = cdOffset.toInt
    val out = Seq.newBuilder[ZipEntry]
    var i = 0L
    var ok = true
    while (ok && i < count) {
      if (pos < 0 || pos + 46 > bytes.length ||
        !(bytes(pos) == 0x50 && bytes(pos + 1) == 0x4b &&
          bytes(pos + 2) == 0x01 && bytes(pos + 3) == 0x02)) ok = false
      else {
        val nameLen = readLe16(bytes, pos + 28)
        val extraLen = readLe16(bytes, pos + 30)
        val commentLen = readLe16(bytes, pos + 32)
        if (pos + 46 + nameLen + extraLen > bytes.length) ok = false
        else {
          var csize = readLe32(bytes, pos + 20)
          var usize = readLe32(bytes, pos + 24)
          // APPNOTE 4.5.3: saturated per-entry fields resolve from the
          // 0x0001 extended-information extra field, values in the
          // fixed order (usize, csize, local offset) with only the
          // saturated ones present.
          if (csize == 0xffffffffL || usize == 0xffffffffL) {
            var e = pos + 46 + nameLen
            val extraEnd = e + extraLen
            var found = false
            while (!found && e + 4 <= extraEnd) {
              val id = readLe16(bytes, e)
              val dlen = readLe16(bytes, e + 2)
              if (id == 1 && e + 4 + dlen <= extraEnd) {
                var f = e + 4
                if (usize == 0xffffffffL && f + 8 <= e + 4 + dlen) {
                  usize = readLe64(bytes, f); f += 8
                }
                if (csize == 0xffffffffL && f + 8 <= e + 4 + dlen) {
                  csize = readLe64(bytes, f); f += 8
                }
                found = true
              } else e += 4 + dlen
            }
            if (!found) ok = false // saturated sizes with no ZIP64 extra
          }
          if (ok) {
            out += ZipEntry(
              new String(bytes, pos + 46, nameLen, UTF_8),
              readLe16(bytes, pos + 10),
              csize, usize,
              readLe32(bytes, pos + 16))
            pos += 46 + nameLen + extraLen + commentLen
            i += 1
          }
        }
      }
    }
    out.result()
  }
}
