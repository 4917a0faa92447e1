package graft.multimodal

/**
 * PDF structural census — decode-free triage for document corpora,
 * the same discipline as the MP4 box walker and MP3 frame census:
 * at 100 TB you cannot render every PDF, but the cross-reference
 * table + trailer (ISO 32000-1 §7.5) tell you, in O(objects) reads
 * against O(file) bytes, whether the file is well-formed, encrypted,
 * how many pages it claims, and how much of it is stream payload —
 * exactly what a curation pass needs to route files to the (much
 * more expensive) text-extraction stage.
 *
 * Census method, never a renderer:
 *  1. header `%PDF-M.N` → version;
 *  2. LAST `startxref` + following integer → xref offset (text
 *     earlier in the file may contain the literal word; the real
 *     pointer is the final one, ISO 32000-1 §7.5.5);
 *  3. classic xref subsections at that offset → in-use ('n') vs
 *     free ('f') entry counts and per-object byte offsets;
 *  4. trailer dict → /Size, /Encrypt flag;
 *  5. per in-use object, scan ONLY the dict region (offset up to the
 *     first `stream` or `endobj`, bounded) for `/Type /Page` (with a
 *     token boundary so `/Pages` never counts) and `/Length` next to
 *     a `stream` keyword — stream payload bytes are summed from the
 *     declared lengths, never read.
 *
 * Total: any byte soup in → None or a best-effort census out, never
 * throws (corpus PDFs are routinely truncated or malformed).
 * Cross-reference STREAMS (PDF 1.5 compressed xref) are out of
 * scope — files using them return None rather than a wrong census.
 */
object PdfParser {

  final case class PdfMeta(
      version: String, nObjects: Int, nFree: Int, size: Int,
      nPages: Int, streamBytes: Long, encrypted: Boolean, hasEof: Boolean)

  private val PageType = """/Type\s*/Page(?![A-Za-z])""".r
  private val LengthKey = """/Length\s+(\d+)""".r
  private val SizeKey = """/Size\s+(\d+)""".r

  /** Totality is enforced here, not proven walk-by-walk: a census
    * over crawled byte soup must NEVER throw, so any escape from the
    * structural walk (e.g. a crafted xref offset that places the
    * table AFTER the final `startxref`) degrades to None. */
  def parse(bytes: Array[Byte]): Option[PdfMeta] =
    try parseImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseImpl(bytes: Array[Byte]): Option[PdfMeta] = {
    if (bytes == null || bytes.length < 16) return None
    // ISO-8859-1: every byte maps to one char — offsets stay exact
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return None
    val verEnd = s.indexWhere(c => c == '\r' || c == '\n', 5)
    if (verEnd < 0 || verEnd > 16) return None
    val version = s.substring(5, verEnd)

    val hasEof = s.lastIndexOf("%%EOF") >= 0
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) return None
    val afterSx = s.substring(sx + 9).dropWhile(c => c == '\r' || c == '\n')
    val offStr = afterSx.takeWhile(_.isDigit)
    if (offStr.isEmpty || offStr.length > 10) return None
    val xrefOff = offStr.toLong
    if (xrefOff < 0 || xrefOff >= bytes.length) return None

    // classic xref table: `xref` then `start count` subsection headers
    var p = xrefOff.toInt
    def skipWs(): Unit =
      while (p < s.length && (s.charAt(p) == ' ' || s.charAt(p) == '\r' ||
        s.charAt(p) == '\n')) p += 1
    def word(): String = {
      skipWs()
      val start = p
      while (p < s.length && !s.charAt(p).isWhitespace) p += 1
      s.substring(start, p)
    }
    if (word() != "xref") return None
    var nUse = 0
    var nFree = 0
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    var ok = true
    while (!done && ok) {
      val save = p
      val w1 = word()
      if (w1 == "trailer") done = true
      else {
        val w2 = word()
        if (w1.forall(_.isDigit) && w2.forall(_.isDigit) &&
          w1.nonEmpty && w2.nonEmpty && w2.length <= 7) {
          val count = w2.toInt
          var i = 0
          while (i < count && ok) {
            val off = word(); val gen = word(); val flag = word()
            if (off.length == 10 && gen.length == 5 &&
              (flag == "n" || flag == "f")) {
              if (flag == "n") {
                nUse += 1
                val o = off.toLong
                if (o < bytes.length) offsets += o.toInt
              } else nFree += 1
            } else ok = false
            i += 1
          }
        } else { ok = false; p = save }
      }
    }
    if (!ok) return None

    // trailer dict: up to the closing `startxref`. A crafted xref
    // offset can place the table AFTER the final startxref (p > sx) —
    // that is not a well-formed PDF (§7.5.5 puts startxref last);
    // refuse rather than throw on the inverted slice.
    if (p >= sx) return None
    val trailer = s.substring(p, math.min(s.length, sx))
    val size = SizeKey.findFirstMatchIn(trailer).map(_.group(1).toInt)
      .getOrElse(-1)
    val encrypted = trailer.contains("/Encrypt")

    // per-object dict scan: offset → first `stream`/`endobj` (bounded)
    var nPages = 0
    var streamBytes = 0L
    offsets.foreach { o =>
      val end = math.min(o + 512, s.length)
      val window = s.substring(o, end)
      val streamAt = window.indexOf("stream")
      val endobjAt = window.indexOf("endobj")
      val dictEnd =
        Seq(streamAt, endobjAt).filter(_ >= 0).reduceOption(_ min _)
          .getOrElse(window.length)
      val dict = window.substring(0, dictEnd)
      if (PageType.findFirstIn(dict).isDefined) nPages += 1
      if (streamAt >= 0 && (endobjAt < 0 || streamAt < endobjAt))
        LengthKey.findFirstMatchIn(dict).foreach(m =>
          streamBytes += m.group(1).toLong)
    }
    Some(PdfMeta(version, nUse, nFree, size, nPages, streamBytes,
      encrypted, hasEof))
  }

  /**
   * Content-stream payload extraction — the stage AFTER the census
   * routes a PDF to text extraction: per in-use object carrying a
   * `stream`, return the raw payload bytes, located by xref offset
   * and framed by the declared `/Length` (§7.3.8 — streams are
   * length-framed, so payloads containing `endstream` or any other
   * keyword extract intact). Objects are visited in xref-offset
   * order, which for a well-formed writer is document order. Total:
   * malformed files return what the xref supports, never throw.
   * (No filter decoding here: corpus PDFs' FlateDecode streams would
   * need inflate — the census's `/Filter`-free builder emits raw
   * streams, and a production path plugs `Inflater` in per stream.)
   */
  def extractStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    if (sx < 0 || !s.startsWith("%PDF-")) return Seq.empty
    // reuse the census walk for offsets: parse() validated framing
    parse(bytes) match {
      case None => Seq.empty
      case Some(_) =>
        val afterSx = s.substring(sx + 9).dropWhile(c => c == '\r' || c == '\n')
        val offStr = afterSx.takeWhile(_.isDigit)
        var p = offStr.toLong.toInt
        val out = Seq.newBuilder[Array[Byte]]
        def word(): String = {
          while (p < s.length && s.charAt(p).isWhitespace) p += 1
          val start = p
          while (p < s.length && !s.charAt(p).isWhitespace) p += 1
          s.substring(start, p)
        }
        if (word() != "xref") return Seq.empty
        var done = false
        try while (!done) {
          val w1 = word()
          if (w1 == "trailer" || w1.isEmpty) done = true
          else {
            val count = word().toInt
            (0 until count).foreach { _ =>
              val off = word(); word(); val flag = word()
              if (flag == "n") {
                val o = off.toLong.toInt
                if (o < s.length) {
                  val window = s.substring(o, math.min(o + 512, s.length))
                  val streamAt = window.indexOf("stream")
                  val endobjAt = window.indexOf("endobj")
                  if (streamAt >= 0 && (endobjAt < 0 || streamAt < endobjAt)) {
                    LengthKey.findFirstMatchIn(
                      window.substring(0, streamAt)).foreach { m =>
                      val len = m.group(1).toInt
                      // payload starts after "stream" + EOL (§7.3.8)
                      var ds = o + streamAt + 6
                      if (ds < bytes.length && bytes(ds) == '\r') ds += 1
                      if (ds < bytes.length && bytes(ds) == '\n') ds += 1
                      if (ds + len <= bytes.length)
                        out += java.util.Arrays.copyOfRange(bytes, ds, ds + len)
                    }
                  }
                }
              }
            }
          }
        } catch {
          // parse() succeeding makes this unreachable for the xref
          // walk itself; belt-and-braces for adversarial bytes
          case scala.util.control.NonFatal(_) => ()
        }
        out.result()
    }
  }

  /**
   * Minimal-but-valid PDF builder (fixture half of the census round
   * trip): catalog + page tree + `nPages` (page, content-stream)
   * pairs, classic xref with exact byte offsets, trailer, startxref.
   * Content streams carry the given RAW bytes (no escaping — stream
   * payloads are length-framed, §7.3.8), so any corpus text slices in
   * verbatim.
   */
  def build(pageContents: Seq[Array[Byte]], version: String = "1.4"): Array[Byte] = {
    require(pageContents.nonEmpty, "a PDF needs at least one page")
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(latin1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w(s"%PDF-$version\n")
    val p = pageContents.length
    offsets += out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until p).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    offsets += out.size()
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $p >>\nendobj\n")
    pageContents.zipWithIndex.foreach { case (content, i) =>
      offsets += out.size()
      w(s"${3 + 2 * i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/Contents ${4 + 2 * i} 0 R >>\nendobj\n")
      offsets += out.size()
      w(s"${4 + 2 * i} 0 obj\n<< /Length ${content.length} >>\nstream\n")
      out.write(content)
      w("\nendstream\nendobj\n")
    }
    val xrefOff = out.size()
    val n = 3 + 2 * p // incl. the free object 0
    w(s"xref\n0 $n\n")
    w(f"${0}%010d ${65535}%05d f \n")
    offsets.foreach(o => w(f"$o%010d ${0}%05d n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
