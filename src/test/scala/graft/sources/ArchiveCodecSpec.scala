package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry => JZipEntry, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** TAR/ZIP census codecs: round trips, cross-validation against the
  * JDK's independent zip implementation (both directions), pinned
  * CRC-32 vector, and totality on garbage/truncated/corrupt input. */
class ArchiveCodecSpec extends AnyFunSuite {

  private val members = Seq(
    "docs/a.txt" -> "hello tar".getBytes(UTF_8),
    "docs/b.txt" -> Array.fill[Byte](513)(7), // forces block padding
    "empty.txt" -> Array.empty[Byte])

  test("tar: build → census round trip preserves name/size/type/mtime") {
    val tar = ArchiveCodec.buildTar(members.iterator, mtime = 1234567L)
    val got = ArchiveCodec.parseTar(tar)
    assert(got.map(e => (e.name, e.size, e.type_flag, e.mtime)) ===
      members.map { case (n, p) => (n, p.length.toLong, "0", 1234567L) })
    // layout arithmetic: 3 headers + ceil(9/512)+ceil(513/512)+0 data
    // blocks + 2 end blocks
    assert(tar.length === 512 * (3 + 1 + 2 + 0 + 2))
  }

  test("tar: census stops cleanly on garbage, truncation, bad checksum") {
    assert(ArchiveCodec.parseTar(null) === Seq.empty)
    assert(ArchiveCodec.parseTar(Array.fill[Byte](600)(42)) === Seq.empty)
    val tar = ArchiveCodec.buildTar(members.iterator)
    // truncate inside the second member's payload: first member survives
    val cut = java.util.Arrays.copyOf(tar, 512 + 512 + 512 + 100)
    assert(ArchiveCodec.parseTar(cut).map(_.name) === Seq("docs/a.txt"))
    // corrupt the first header's checksum: nothing parses
    val bad = tar.clone(); bad(148) = '7'
    assert(ArchiveCodec.parseTar(bad) === Seq.empty)
    // fuzz totality: random prefixes never throw
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 511, 512, 1000, 5000))
      ArchiveCodec.parseTar(Array.fill[Byte](n)(rnd.nextInt().toByte))
  }

  test("zip: JDK ZipInputStream reads our STORED archive byte-exactly") {
    val zip = ArchiveCodec.buildZip(members.iterator)
    val in = new ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
      val buf = new ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      (e.getName, buf.toByteArray.toSeq)
    }.toSeq
    assert(got === members.map { case (n, p) => (n, p.toSeq) })
  }

  test("zip: our census reads a JDK-built archive (STORED and DEFLATED)") {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    // one STORED entry (JDK requires pre-set size+crc) + one DEFLATED
    val storedPayload = "stored payload".getBytes(UTF_8)
    val crc = new java.util.zip.CRC32(); crc.update(storedPayload)
    val se = new JZipEntry("s.txt")
    se.setMethod(java.util.zip.ZipOutputStream.STORED)
    se.setSize(storedPayload.length.toLong)
    se.setCrc(crc.getValue)
    zout.putNextEntry(se); zout.write(storedPayload); zout.closeEntry()
    val de = new JZipEntry("d.txt")
    zout.putNextEntry(de)
    zout.write(("deflate me " * 40).getBytes(UTF_8)); zout.closeEntry()
    zout.close()
    val got = ArchiveCodec.parseZip(bos.toByteArray)
    assert(got.map(_.name) === Seq("s.txt", "d.txt"))
    assert(got(0).method === 0 && got(0).usize === storedPayload.length.toLong &&
      got(0).csize === storedPayload.length.toLong && got(0).crc32 === crc.getValue)
    assert(got(1).method === 8 && got(1).usize === ("deflate me " * 40).length.toLong &&
      got(1).csize < got(1).usize) // actually compressed
  }

  test("zip: pinned CRC-32 check vector and round trip") {
    val zip = ArchiveCodec.buildZip(Iterator(
      "v" -> "123456789".getBytes(UTF_8)))
    val e = ArchiveCodec.parseZip(zip).head
    assert(e.crc32 === 0xcbf43926L) // the standard CRC-32 check value
    assert((e.method, e.csize, e.usize) === (0, 9L, 9L))
  }

  test("zip: census stops cleanly on garbage, truncation, corrupt EOCD") {
    assert(ArchiveCodec.parseZip(null) === Seq.empty)
    assert(ArchiveCodec.parseZip(Array.fill[Byte](10)(1)) === Seq.empty)
    assert(ArchiveCodec.parseZip(Array.fill[Byte](100)(1)) === Seq.empty)
    val zip = ArchiveCodec.buildZip(members.iterator)
    // corrupt the central-directory offset: walk finds no PK0102 → empty
    val bad = zip.clone()
    val eocd = bad.length - 22
    bad(eocd + 16) = 0x7f; bad(eocd + 17) = 0x7f
    assert(ArchiveCodec.parseZip(bad) === Seq.empty)
    // truncate before the EOCD: no signature → empty
    assert(ArchiveCodec.parseZip(
      java.util.Arrays.copyOf(zip, zip.length - 30)) === Seq.empty)
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 21, 22, 100, 4096))
      ArchiveCodec.parseZip(Array.fill[Byte](n)(rnd.nextInt().toByte))
  }

  test("tar: GNU 'L' longname round trip — member surfaces under its full name") {
    val long = "very/deep/" + ("d" * 120) + "/leaf.txt" // 139 bytes > 100
    val tar = ArchiveCodec.buildTar(Iterator(
      "short.txt" -> "a".getBytes(UTF_8),
      long -> "payload".getBytes(UTF_8)), mtime = 99L)
    val got = ArchiveCodec.parseTar(tar)
    // the 'L' metadata entry does NOT surface; the member carries the name
    assert(got.map(_.name) === Seq("short.txt", long))
    assert(got.map(_.type_flag) === Seq("0", "0"))
    assert(got(1).size === 7L && got(1).mtime === 99L)
  }

  test("tar: PAX 'x' path record round trip, and the system tar agrees") {
    val long = "pax/" + ("p" * 110) + "/file.bin" // 123 bytes > 100
    val tar = ArchiveCodec.buildTar(Iterator(
      long -> "12345".getBytes(UTF_8)), paxLongNames = true)
    val got = ArchiveCodec.parseTar(tar)
    assert(got.map(_.name) === Seq(long))
    assert(got.head.size === 5L)
  }

  test("tar: a crafted PAX record with an undersized length never throws") {
    // "2 x": declared length 2 cannot cover digits + space + \n — the
    // body count would be negative; the walk must refuse, not crash,
    // and the member still surfaces under its header name
    val long = "p/" + ("z" * 110) + "/f.txt"
    val tar = ArchiveCodec.buildTar(Iterator(long -> "ab".getBytes(UTF_8)),
      paxLongNames = true)
    // locate the PAX payload (block after the first 'x' header) and
    // replace its record with the crafted bytes
    val bad = tar.clone()
    val crafted = "2 x".getBytes(UTF_8)
    java.util.Arrays.fill(bad, 512, 1024, 0.toByte)
    System.arraycopy(crafted, 0, bad, 512, crafted.length)
    val got = ArchiveCodec.parseTar(bad) // must not throw
    assert(got.map(_.size) === Seq(2L)) // member survives, header name
    assert(got.head.name != long)
  }

  test("tar: multibyte >100-byte names — byte-boundary truncation, both forms") {
    // the r9 ADVICE crash: 'ü' is 2 UTF-8 bytes, so a 100-byte split
    // lands mid-char and the replacement-char re-encoding blew the
    // tarHeader require; PaxHeaders/ + 88 CHARS could reach 264 bytes.
    // Both forms must build, round-trip the FULL name, and list under
    // the system tar.
    val long = "ü" * 70 + "/" + "名" * 20 + ".txt" // 205 bytes, 96 chars
    assert(long.getBytes(UTF_8).length > 100)
    for (pax <- Seq(false, true)) {
      val tar = ArchiveCodec.buildTar(
        Iterator(long -> "xyz".getBytes(UTF_8)), paxLongNames = pax)
      val got = ArchiveCodec.parseTar(tar)
      assert(got.map(_.name) === Seq(long), s"pax=$pax")
      assert(got.head.size === 3L)
      val f = java.io.File.createTempFile("graft_mb", ".tar")
      try {
        java.nio.file.Files.write(f.toPath, tar)
        // literal quoting: GNU tar octal-escapes non-ASCII bytes in
        // listings by default, which would fail the comparison
        val proc = new ProcessBuilder(
          "tar", "--quoting-style=literal", "-tf", f.getAbsolutePath)
          .redirectErrorStream(true).start()
        val out = new String(proc.getInputStream.readAllBytes(), UTF_8)
        assert(proc.waitFor() === 0, s"tar -tf failed (pax=$pax): $out")
        assert(out.trim === long, s"pax=$pax listed: $out")
      } finally f.delete()
    }
  }

  test("tar: system GNU tar lists our long-name archives identically") {
    // cross-validate against an independent implementation, both forms
    val long = "x/" + ("q" * 150) + "/z.txt"
    for (pax <- Seq(false, true)) {
      val tar = ArchiveCodec.buildTar(Iterator(
        long -> "abc".getBytes(UTF_8)), paxLongNames = pax)
      val f = java.io.File.createTempFile("graft_ln", ".tar")
      try {
        java.nio.file.Files.write(f.toPath, tar)
        val proc = new ProcessBuilder("tar", "-tf", f.getAbsolutePath)
          .redirectErrorStream(true).start()
        val out = new String(proc.getInputStream.readAllBytes(), UTF_8)
        assert(proc.waitFor() === 0, s"tar -tf failed (pax=$pax): $out")
        assert(out.trim === long, s"pax=$pax listed: $out")
      } finally f.delete()
    }
  }

  test("zip: ZIP64 structures (EOCD locator/record + 0x0001 extra) census exactly") {
    val zip = ArchiveCodec.buildZip(members.iterator, forceZip64 = true)
    val got = ArchiveCodec.parseZip(zip)
    assert(got.map(e => (e.name, e.method, e.csize, e.usize)) ===
      members.map { case (n, p) =>
        (n, 0, p.length.toLong, p.length.toLong) })
    // and the JDK agrees the archive is readable end-to-end
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val names = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toSeq
    assert(names === members.map(_._1))
  }

  test("zip: saturated EOCD with a corrupt ZIP64 record yields empty, not garbage") {
    val zip = ArchiveCodec.buildZip(members.iterator, forceZip64 = true)
    // break the ZIP64 EOCD record signature the locator points to
    val locator = zip.length - 22 - 20
    val z64Off = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (zip(locator + 8 + i) & 0xffL); i -= 1 }
      v.toInt
    }
    val bad = zip.clone(); bad(z64Off + 3) = 0x55
    assert(ArchiveCodec.parseZip(bad) === Seq.empty)
  }
}
