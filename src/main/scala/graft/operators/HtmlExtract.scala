package graft.operators

/**
 * HTML → text extraction — the curation stage between the WARC ingest
 * path ([[graft.sources.WarcCodec]] reads the crawl wire format, its
 * HTTP payloads are HTML) and every downstream text operator
 * (quality, dedup, lang-id). C4 / CCNet-style pipelines run exactly
 * this pass over the whole crawl, so it must be a scan-local,
 * shuffle-free, total function of the page bytes.
 *
 * Reference scope note: the reference app ingests pre-extracted text
 * (`/root/reference/app.py` reads `text` straight from its store);
 * this operator is part of the beyond-reference LLM-pipeline surface
 * that produces such text from raw crawl HTML at 100 TB.
 *
 * Design constraints, in order:
 *  - TOTAL: any byte soup in → some string out, never throws. Crawl
 *    HTML is adversarially malformed; a thrown exception on one page
 *    kills a 10k-page task.
 *  - Single pass, no DOM: a real crawl page is ~100 KB and a DOM
 *    allocates ~10× that; this walk is O(n) with two StringBuilders.
 *  - `<script>`/`<style>` content is DROPPED WHOLE (scanning for the
 *    matching close tag, case-insensitive) — JS strings routinely
 *    contain `"<p>"` markup that a naive tag-stripper would leak.
 *  - Tag scan is QUOTE-AWARE: `<a title="a>b">` ends at the real
 *    `>`, not the one inside the attribute value.
 *  - Entities: the named set that dominates crawl text (amp, lt, gt,
 *    quot, apos, nbsp → plain space) plus full numeric `&#NNN;` /
 *    `&#xHH;` decode; an invalid entity is kept literally (crawl
 *    text contains bare `&`).
 *  - Block-level tags separate words; inline tags (b, i, em, span,
 *    a, …) do not split `con<b>cat</b>`; unknown tags are treated as
 *    block (safer to over-separate than to glue words).
 *  - All whitespace collapses to single spaces at the end, so the
 *    output is stable under reformatting of the source page.
 */
object HtmlExtract {

  /** `title` = text inside `<title>`, excluded from `text`;
    * `nLinks` = count of `<a` opening tags; `links` = the non-empty
    * `href` attribute values of those tags, in document order, with
    * entities decoded (`&amp;` is routine inside crawl URLs) — the raw
    * material of the link graph ([[UrlOps.resolve]] turns them
    * absolute against the page URL). An anchor without an href (a
    * named anchor) counts in `nLinks` but contributes no link.
    * `canonical` = the FIRST `<link rel="canonical" href=…>` value
    * ("" when absent) — the page's self-declared dedup key, the
    * strongest single signal crawl dedup has (two fetch URLs naming
    * the same canonical ARE the same page, by the site's own word;
    * resolve it against the page URL before grouping). */
  final case class Extracted(
      title: String, text: String, nLinks: Int, links: Seq[String],
      canonical: String = "")

  private val InlineTags = Set(
    "a", "b", "i", "u", "em", "strong", "span", "code", "small",
    "sub", "sup", "abbr", "cite", "q", "s", "mark", "time", "wbr")

  private val NamedEntities = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Decode one entity body (the part between `&` and `;`): the named
    * set or numeric `#NNN` / `#xHH`; None = not a valid entity (the
    * caller keeps the raw text — crawl HTML contains bare `&`). */
  private def decodeEntityBody(body: String): Option[String] = {
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp))
        Some(new String(Character.toChars(cp)))
      else None
    } else NamedEntities.get(body.toLowerCase).map(_.toString)
  }

  /** Entity-decode a whole string (attribute values); invalid
    * entities stay literal. */
  def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return if (s == null) "" else s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          decodeEntityBody(s.substring(i + 1, semi)) match {
            case Some(str) => sb.append(str); i = semi + 1
            case None      => sb.append('&'); i += 1
          }
        } else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Value of attribute `attrName` inside the tag span
    * `[lt, end)` (`lt` at `<`, `end` just past `>`): quote-aware —
    * other attributes' quoted values are skipped whole, so
    * `title="href=x"` can never shadow the real href; supports
    * double-quoted, single-quoted, and unquoted values. None when the
    * attribute is absent. */
  private def attrValue(
      html: String, lt: Int, end: Int, attrName: String): Option[String] = {
    var p = lt + 1
    while (p < end) {
      val c = html.charAt(p)
      if (c == '"' || c == '\'') { // not our attr's value: skip it whole
        p += 1
        while (p < end && html.charAt(p) != c) p += 1
        p += 1
      } else if (html.regionMatches(true, p, attrName, 0, attrName.length) &&
          p > lt + 1 && {
            val before = html.charAt(p - 1)
            before == ' ' || before == '\t' || before == '\n' ||
              before == '\r' || before == '\f' || before == '/'
          }) {
        var q = p + attrName.length
        while (q < end && Character.isWhitespace(html.charAt(q))) q += 1
        if (q < end && html.charAt(q) == '=') {
          q += 1
          while (q < end && Character.isWhitespace(html.charAt(q))) q += 1
          if (q >= end) return None
          val qc = html.charAt(q)
          if (qc == '"' || qc == '\'') {
            var ve = q + 1
            while (ve < end && html.charAt(ve) != qc) ve += 1
            return Some(html.substring(q + 1, math.min(ve, end)))
          } else {
            var ve = q
            while (ve < end && !Character.isWhitespace(html.charAt(ve)) &&
              html.charAt(ve) != '>') ve += 1
            return Some(html.substring(q, ve))
          }
        } else p = q
      } else p += 1
    }
    None
  }

  /** (href, anchor text) pairs in document order — the link graph's
    * EDGE LABELS: inbound anchor text is the classic description of
    * the TARGET page (the signal early web search weighted above the
    * page's own words), and aggregating it per target domain gives a
    * keyword profile no on-page analysis can. Anchor text is the
    * visible text between `<a href=…>` and `</a>` with nested markup
    * stripped (`<a><b>bold</b></a>` → "bold"), entities decoded, and
    * whitespace collapsed; named anchors (no href) contribute
    * nothing; an unclosed anchor runs to the next `<a` or EOF
    * (browser recovery). Scan-local like [[extract]]. */
  def anchors(html: String): Seq[(String, String)] = {
    if (html == null) return Nil
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var curHref: String = null
    val curText = new StringBuilder
    var i = 0

    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def tagEnd(from: Int): Int = {
      var p = from
      var quote: Char = 0
      while (p < n) {
        val c = html.charAt(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return p + 1
        p += 1
      }
      n
    }
    def boundary(p: Int): Boolean =
      p >= n || !Character.isLetterOrDigit(html.charAt(p))
    def flush(): Unit = {
      if (curHref != null) out += ((curHref, collapseWs(curText.toString)))
      curHref = null
      curText.setLength(0)
    }

    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if ((lowerAt(i, "<script") && boundary(i + 7)) ||
            (lowerAt(i, "<style") && boundary(i + 6))) {
          val name = if (lowerAt(i, "<script")) "script" else "style"
          var p = tagEnd(i)
          var end = n
          var done = false
          while (!done && p < n) {
            if (lowerAt(p, "</" + name) && boundary(p + 2 + name.length)) {
              end = tagEnd(p); done = true
            } else p += 1
          }
          i = end
        } else if (lowerAt(i, "<a") && boundary(i + 2)) {
          flush() // a second <a> closes an unterminated one (browser rule)
          val te = tagEnd(i)
          curHref = attrValue(html, i, te, "href")
            .map(v => decodeEntities(v.trim)).filter(_.nonEmpty).orNull
          i = te
        } else if (lowerAt(i, "</a") && boundary(i + 3)) {
          flush()
          i = tagEnd(i)
        } else {
          // other markup inside an anchor separates words, never glues
          if (curHref != null) curText.append(' ')
          i = tagEnd(i)
        }
      } else if (html.charAt(i) == '&' && curHref != null) {
        val semi = html.indexOf(';', i + 1)
        var decoded = false
        if (semi > i && semi - i <= 10) {
          decodeEntityBody(html.substring(i + 1, semi)) match {
            case Some(str) => curText.append(str); decoded = true
            case None      => ()
          }
        }
        if (decoded) i = semi + 1 else { curText.append('&'); i += 1 }
      } else {
        if (curHref != null) curText.append(html.charAt(i))
        i += 1
      }
    }
    flush() // EOF closes an unterminated anchor
    out.toSeq
  }

  /** `<link rel="alternate" hreflang=… href=…>` pairs in document
    * order — the page's SELF-DECLARED translation set: sites publish
    * their language variants (the hreflang annotations search engines
    * consume), and a multilingual pipeline that reads them gets
    * aligned-document candidates for free, BEFORE any embedding model
    * runs ([[BitextMining]] then scores them). Same scan discipline
    * as [[anchors]]; entities decoded, empty values dropped. */
  def hreflangs(html: String): Seq[(String, String)] = {
    if (html == null) return Nil
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def tagEnd(from: Int): Int = {
      var p = from
      var quote: Char = 0
      while (p < n) {
        val c = html.charAt(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return p + 1
        p += 1
      }
      n
    }
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<link") &&
            (i + 5 >= n || !Character.isLetterOrDigit(html.charAt(i + 5)))) {
          val te = tagEnd(i)
          if (attrValue(html, i, te, "rel")
              .exists(_.trim.equalsIgnoreCase("alternate"))) {
            for {
              lang <- attrValue(html, i, te, "hreflang")
                .map(_.trim.toLowerCase).filter(_.nonEmpty)
              href <- attrValue(html, i, te, "href")
                .map(v => decodeEntities(v.trim)).filter(_.nonEmpty)
            } out += ((lang, href))
          }
          i = te
        } else i = tagEnd(i)
      } else i += 1
    }
    out.toSeq
  }

  def extract(html: String): Extracted = {
    if (html == null) return Extracted("", "", 0, Nil)
    val n = html.length
    val text = new StringBuilder
    val title = new StringBuilder
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    var inTitle = false
    var nLinks = 0
    var canonical = ""
    var i = 0

    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)

    // end index just past the tag's real '>' (quote-aware); n if unterminated
    def tagEnd(from: Int): Int = {
      var p = from
      var quote: Char = 0
      while (p < n) {
        val c = html.charAt(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return p + 1
        p += 1
      }
      n
    }

    def tagNameAt(p0: Int): String = {
      var p = p0
      val sb = new StringBuilder
      while (p < n && sb.length < 12 && {
          val c = html.charAt(p)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9')
        }) { sb.append(Character.toLowerCase(html.charAt(p))); p += 1 }
      sb.toString
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val name = tagNameAt(if (closing) i + 2 else i + 1)
          // a name boundary: next char may not extend the name
          // (`<scripty>` is NOT `<script>`)
          if (!closing && (name == "script" || name == "style")) {
            val open = tagEnd(i)
            var p = open
            var end = n
            var done = false
            while (!done && p < n) {
              // boundary check: "</scripty>" must not close "<script>"
              val q = p + 2 + name.length
              if (lowerAt(p, "</" + name) &&
                  (q >= n || !Character.isLetterOrDigit(html.charAt(q)))) {
                end = tagEnd(p); done = true
              } else p += 1
            }
            i = end
          } else {
            val te = tagEnd(i)
            if (name == "title") inTitle = !closing
            if (!closing && name == "a") {
              nLinks += 1
              attrValue(html, i, te, "href")
                .map(v => decodeEntities(v.trim)).filter(_.nonEmpty)
                .foreach(links += _)
            }
            if (!closing && name == "link" && canonical.isEmpty &&
                attrValue(html, i, te, "rel").exists(_.trim
                  .equalsIgnoreCase("canonical")))
              attrValue(html, i, te, "href")
                .map(v => decodeEntities(v.trim)).filter(_.nonEmpty)
                .foreach(canonical = _)
            if (!InlineTags.contains(name))
              (if (inTitle) title else text).append(' ')
            i = te
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val out = if (inTitle) title else text
        var decoded = false
        if (semi > i && semi - i <= 10) {
          decodeEntityBody(html.substring(i + 1, semi)) match {
            case Some(str) => out.append(str); decoded = true
            case None      => ()
          }
        }
        if (decoded) i = semi + 1
        else { out.append('&'); i += 1 }
      } else {
        (if (inTitle) title else text).append(c)
        i += 1
      }
    }
    Extracted(collapseWs(title.toString), collapseWs(text.toString), nLinks,
      links.toSeq, canonical)
  }

  /** Collapse runs of ASCII whitespace to single spaces and trim —
    * keeps the output independent of source-page formatting. */
  def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (sb.nonEmpty) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Minimal escape for embedding arbitrary text in an HTML text node
    * — the builder half of the round-trip driver row. */
  def escapeHtml(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Robots directives as a crawl/index gate sees them. */
  final case class RobotsDirectives(
      noindex: Boolean, nofollow: Boolean, noarchive: Boolean,
      nofollowLinks: Int)

  /**
   * `<meta name="robots">` directives + per-link `rel="nofollow"`
   * counts — the in-document half of the robots protocol (the
   * robots.txt operator covers the other half). `content` tokens are
   * comma-separated, case-insensitive; `none` means
   * noindex+nofollow (the Google/Bing documented equivalence). A
   * page-level nofollow and link-level rel=nofollow are DIFFERENT
   * signals (frontier suppression vs edge suppression), so both are
   * reported. Same scan-local single-pass walk as [[hreflangs]];
   * comments skipped, attribute quoting handled by the shared
   * [[attrValue]].
   */
  def metaRobots(html: String): RobotsDirectives = {
    if (html == null) return RobotsDirectives(false, false, false, 0)
    val n = html.length
    var noindex = false; var nofollow = false; var noarchive = false
    var nfLinks = 0
    var i = 0
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def tagEnd(from: Int): Int = {
      var p = from
      var quote: Char = 0
      while (p < n) {
        val c = html.charAt(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return p + 1
        p += 1
      }
      n
    }
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<meta") &&
            (i + 5 >= n || !Character.isLetterOrDigit(html.charAt(i + 5)))) {
          val te = tagEnd(i)
          if (attrValue(html, i, te, "name")
              .exists(_.trim.equalsIgnoreCase("robots"))) {
            attrValue(html, i, te, "content").foreach { c =>
              c.split(',').map(_.trim.toLowerCase).foreach {
                case "noindex" => noindex = true
                case "nofollow" => nofollow = true
                case "noarchive" => noarchive = true
                case "none" => noindex = true; nofollow = true
                case _ => ()
              }
            }
          }
          i = te
        } else if (lowerAt(i, "<a") &&
            (i + 2 >= n || !Character.isLetterOrDigit(html.charAt(i + 2)))) {
          val te = tagEnd(i)
          if (attrValue(html, i, te, "rel").exists(
              _.split(Array(' ', '\t', '\n', '\r'))
                .exists(_.equalsIgnoreCase("nofollow"))))
            nfLinks += 1
          i = te
        } else i = tagEnd(i)
      } else i += 1
    }
    RobotsDirectives(noindex, nofollow, noarchive, nfLinks)
  }
}
