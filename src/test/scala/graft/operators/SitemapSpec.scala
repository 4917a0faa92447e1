package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {
  import Sitemap._

  test("urlset: full entries, entity-decoded loc, field capture") {
    val p = parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://h.example/a?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-15</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://h.example/b</loc></url>
        |</urlset>""".stripMargin)
    assert(!p.isIndex && p.entries.size === 2)
    assert(p.entries(0) === Entry("https://h.example/a?x=1&y=2",
      "2026-01-15", "daily", 0.8))
    assert(p.entries(1).loc === "https://h.example/b")
    assert(p.entries(1).lastmod === "" && p.entries(1).priority.isNaN)
  }

  test("sitemapindex: child sitemaps, isIndex flag") {
    val p = parse(
      """<sitemapindex>
        |  <sitemap><loc>https://h.example/s1.xml</loc>
        |    <lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://h.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)
    assert(p.isIndex && p.entries.map(_.loc) ===
      Seq("https://h.example/s1.xml", "https://h.example/s2.xml"))
  }

  test("hostile input: missing loc skipped, bad priority NaN, truncation total") {
    val p = parse(
      """<urlset>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |  <url><loc>https://h.example/ok</loc><priority>high</priority></url>
        |  <url><loc></loc></url>
        |  <url><loc>https://h.example/tail""".stripMargin)
    assert(p.entries.size === 1)
    assert(p.entries.head.loc === "https://h.example/ok")
    assert(p.entries.head.priority.isNaN)
    assert(parse(null).entries === Nil)
    assert(parse("").entries === Nil)
    assert(parse("not xml at all").entries === Nil)
    // '<urlx>' is not '<url>': tag boundary respected
    assert(parse("<urlset><urlx><loc>https://n.example</loc></urlx></urlset>")
      .entries === Nil)
  }

  test("fuzz totality: arbitrary strings never throw") {
    val rnd = new scala.util.Random(5151)
    val alphabet = "<>/locurlsitemapxindex&; \n".toCharArray
    (0 until 2000).foreach { _ =>
      val s = new String(
        Array.fill(rnd.nextInt(160))(alphabet(rnd.nextInt(alphabet.length))))
      parse(s) // must not throw
    }
  }
}
