package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** PDF census: build→parse round trip with hand counts from the ISO
  * 32000-1 layout, adversarial stream payloads, /Pages vs /Page token
  * boundary, encryption flag, and fuzz totality. */
class PdfParserSpec extends AnyFunSuite {

  private def pages(contents: String*): Array[Byte] =
    PdfParser.build(contents.map(_.getBytes(UTF_8)))

  test("round trip: 2 pages -> 6 in-use objects, 1 free, /Size 7, exact stream bytes") {
    val m = PdfParser.parse(pages("hello world", "page two!")).get
    assert(m.version === "1.4")
    assert(m.nObjects === 6) // catalog, pages, 2x(page, content)
    assert(m.nFree === 1)
    assert(m.size === 7)
    assert(m.nPages === 2)
    assert(m.streamBytes === "hello world".length + "page two!".length)
    assert(!m.encrypted)
    assert(m.hasEof)
  }

  test("one page, empty content stream") {
    val m = PdfParser.parse(pages("")).get
    assert(m.nPages === 1 && m.nObjects === 4 && m.streamBytes === 0L)
  }

  test("multi-byte UTF-8 content counts BYTES, not chars") {
    val text = "héllo–π" // 7 chars, more bytes
    val m = PdfParser.parse(pages(text)).get
    assert(m.streamBytes === text.getBytes(UTF_8).length.toLong)
  }

  test("adversarial stream payloads: literal 'startxref'/'endobj'/'xref' inside content") {
    // the census must use the LAST startxref and xref OFFSETS, never
    // string-scan payload bytes
    val m = PdfParser.parse(pages(
      "startxref\n999\n%%EOF", "endobj 4 0 obj xref\n0 3", "/Type /Page")).get
    assert(m.nPages === 3)
    assert(m.nObjects === 8 && m.size === 9)
  }

  test("/Type /Pages does not count as a page (token boundary)") {
    // the page-tree object carries /Type /Pages; a 1-page file must
    // census exactly 1 page, not 2
    val m = PdfParser.parse(pages("x")).get
    assert(m.nPages === 1)
  }

  test("/Encrypt in the trailer is flagged") {
    val base = new String(pages("secret"), ISO_8859_1)
    // trailer follows the xref table: object offsets and the
    // startxref pointer are unaffected by editing it
    val enc = base.replace("<< /Size", "<< /Encrypt 9 0 R /Size")
    val m = PdfParser.parse(enc.getBytes(ISO_8859_1)).get
    assert(m.encrypted)
  }

  test("totality: header-less, truncated, and random bytes never throw") {
    assert(PdfParser.parse(null) === None)
    assert(PdfParser.parse(Array.emptyByteArray) === None)
    assert(PdfParser.parse("not a pdf at all, nope".getBytes(UTF_8)) === None)
    val whole = pages("abc", "def")
    // every truncation point: Option out, never an exception
    (0 until whole.length by 7).foreach { cut =>
      PdfParser.parse(java.util.Arrays.copyOf(whole, cut))
    }
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      PdfParser.parse(b)
      // also: valid header + random tail
      PdfParser.parse("%PDF-1.7\n".getBytes(UTF_8) ++ b)
    }
  }

  test("a dangling startxref offset (past EOF) returns None, not garbage") {
    val broken = ("%PDF-1.4\n1 0 obj\nendobj\nstartxref\n99999\n%%EOF\n")
      .getBytes(UTF_8)
    assert(PdfParser.parse(broken) === None)
  }

  test("xref table placed AFTER the final startxref returns None, not a throw") {
    // crafted/truncated shape: the startxref pointer targets an xref
    // table that physically FOLLOWS the startxref keyword, so the
    // trailer slice would be inverted (p > sx). §7.5.5 puts startxref
    // last in a well-formed file — this must refuse, not crash.
    val head = "%PDF-1.4\n"
    val sxBlock = "startxref\nOFFSETXX\n%%EOF\n"
    val xrefBlock = "xref\n0 1\n0000000000 65535 f \ntrailer\n<< /Size 1 >>\n"
    val off = (head + sxBlock).length
    val doc = head + sxBlock.replace("OFFSETXX", f"$off%08d") + xrefBlock
    assert(PdfParser.parse(doc.getBytes(UTF_8)) === None)
    assert(PdfParser.extractStreams(doc.getBytes(UTF_8)) === Seq.empty)
  }

  test("extractStreams: payloads come back byte-identical, in document order") {
    val contents = Seq("first page", "second page", "third")
      .map(_.getBytes(UTF_8))
    val got = PdfParser.extractStreams(PdfParser.build(contents))
    assert(got.map(new String(_, UTF_8)) ===
      Seq("first page", "second page", "third"))
  }

  test("extractStreams: length framing survives 'endstream'/'stream' inside payloads") {
    val tricky = Seq("x endstream y", "stream\nxref 0 3 trailer")
      .map(_.getBytes(UTF_8))
    val got = PdfParser.extractStreams(PdfParser.build(tricky))
    assert(got.map(new String(_, UTF_8)) ===
      Seq("x endstream y", "stream\nxref 0 3 trailer"))
  }

  test("extractStreams: empty stream, binary bytes, and totality on garbage") {
    val bin = Array[Byte](0, 1, 2, -1, -128, 127)
    val got = PdfParser.extractStreams(PdfParser.build(Seq(Array.emptyByteArray, bin)))
    assert(got.length === 2)
    assert(got(0).isEmpty && got(1).toSeq === bin.toSeq)
    assert(PdfParser.extractStreams(null) === Seq.empty)
    assert(PdfParser.extractStreams("junk".getBytes(UTF_8)) === Seq.empty)
    val whole = PdfParser.build(Seq("abc".getBytes(UTF_8)))
    (0 until whole.length by 11).foreach { cut =>
      PdfParser.extractStreams(java.util.Arrays.copyOf(whole, cut))
    }
  }
}
