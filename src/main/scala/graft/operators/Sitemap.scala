package graft.operators

import scala.collection.mutable.ArrayBuffer

/**
 * Sitemap protocol parser (sitemaps.org — the XML format robots.txt's
 * `Sitemap:` lines point at) — the frontier-SEEDING side of the crawl
 * stack, closing the loop [[RobotsTxt]] opens: policy says what may
 * be fetched, sitemaps say what the site WANTS fetched (with
 * modification dates and priorities that order the frontier).
 *
 * Same discipline as [[HtmlExtract]]: single pass, no XML library, no
 * DOM — a 50 MB urlset (the protocol's own size cap) walks in O(n)
 * with per-entry allocations only — and TOTAL: truncated, misnested,
 * or junk-laden input yields the well-formed entries it contains,
 * never a throw. Handles both `<urlset>` (leaf pages) and
 * `<sitemapindex>` (pointers to child sitemaps), entity-decodes
 * `<loc>` (ampersands in URLs are `&amp;` by spec), and parses
 * `<priority>` / keeps `<lastmod>`/`<changefreq>` verbatim.
 */
object Sitemap {

  /** One `<url>` (or `<sitemap>`) entry; `priority` NaN when absent
    * or malformed (the protocol default 0.5 is the CALLER's choice —
    * the parser reports what the file says). */
  final case class Entry(
      loc: String, lastmod: String, changefreq: String, priority: Double)

  /** `isIndex` = the file is a `<sitemapindex>` (entries point at
    * child sitemaps, not pages). */
  final case class Parsed(isIndex: Boolean, entries: Seq[Entry])

  private def tagBody(xml: String, from: Int, until: Int, tag: String): Option[String] = {
    val open = indexOfTag(xml, from, until, tag)
    if (open < 0) return None
    val start = xml.indexOf('>', open)
    if (start < 0 || start >= until) return None
    val close = xml.indexOf(s"</$tag", start + 1)
    if (close < 0 || close >= until) return None
    Some(xml.substring(start + 1, close).trim)
  }

  /** Index of `<tag` at a real tag boundary (next char closes the
    * name) within [from, until); -1 when absent. */
  private def indexOfTag(xml: String, from: Int, until: Int, tag: String): Int = {
    var p = from
    val probe = "<" + tag
    while (p < until) {
      val i = xml.indexOf(probe, p)
      if (i < 0 || i >= until) return -1
      val after = i + probe.length
      if (after >= xml.length) return -1
      val c = xml.charAt(after)
      if (c == '>' || Character.isWhitespace(c) || c == '/') return i
      p = i + 1
    }
    -1
  }

  /** Parse one sitemap file (urlset or sitemapindex). Total. */
  def parse(xml: String): Parsed = {
    if (xml == null) return Parsed(isIndex = false, Nil)
    val n = xml.length
    val isIndex = indexOfTag(xml, 0, n, "sitemapindex") >= 0
    val entryTag = if (isIndex) "sitemap" else "url"
    val out = ArrayBuffer.empty[Entry]
    var p = 0
    var done = false
    while (!done) {
      val open = indexOfTag(xml, p, n, entryTag)
      if (open < 0) done = true
      else {
        val close = xml.indexOf(s"</$entryTag", open + 1)
        val until = if (close < 0) n else close
        tagBody(xml, open, until, "loc").filter(_.nonEmpty).foreach { rawLoc =>
          val loc = HtmlExtract.decodeEntities(rawLoc)
          val lastmod = tagBody(xml, open, until, "lastmod").getOrElse("")
          val changefreq = tagBody(xml, open, until, "changefreq").getOrElse("")
          val priority = tagBody(xml, open, until, "priority") match {
            case Some(v) =>
              try v.toDouble catch { case _: NumberFormatException => Double.NaN }
            case None => Double.NaN
          }
          out += Entry(loc, lastmod, changefreq, priority)
        }
        p = if (close < 0) n else close + 1
        if (p >= n) done = true
      }
    }
    Parsed(isIndex, out.toSeq)
  }
}
