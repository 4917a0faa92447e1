package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {
  import HtmlExtract._

  test("basic tag strip with block separation and ws collapse") {
    val e = extract("<html><body><p>Hello</p>\n  <p>World</p></body></html>")
    assert(e.text === "Hello World" && e.title === "" && e.nLinks === 0)
  }

  test("inline tags do not split words; block tags do") {
    assert(extract("<p>con<b>cat</b>enate</p>").text === "concatenate")
    assert(extract("<div>a</div><div>b</div>").text === "a b")
    assert(extract("x<br>y").text === "x y")
    // unknown tags are treated as block (over-separate, never glue)
    assert(extract("a<custom>b</custom>").text === "a b")
  }

  test("script and style content dropped whole, even with nested markup") {
    val html = """<script>var x = "<p>leak</p>";</script><p>kept</p>""" +
      """<style>p:before { content: "<b>no</b>" }</style>"""
    assert(extract(html).text === "kept")
    // case-insensitive close, attributes on the open tag
    assert(extract("""<SCRIPT type="a">x</ScRiPt>ok""").text === "ok")
    // "</scripty>" must not close "<script>"
    assert(extract("<script>a</scripty>b</script>c").text === "c")
  }

  test("comments dropped; unterminated comment/script/tag are total") {
    assert(extract("a<!-- <p>gone</p> -->b").text === "ab")
    assert(extract("a<!-- never closed").text === "a")
    assert(extract("a<script>never closed").text === "a")
    assert(extract("a<p attr=").text === "a")
  }

  test("links: href values collected in order, entities decoded") {
    val e = extract(
      """<a href="https://x.example/a">1</a>
        |<a href='/rel/path'>2</a>
        |<a href=bare?q=1>3</a>
        |<a class="nav" href="/y?a=1&amp;b=2">4</a>
        |<a name="top">no href</a>""".stripMargin)
    assert(e.links === Seq(
      "https://x.example/a", "/rel/path", "bare?q=1", "/y?a=1&b=2"))
    assert(e.nLinks === 5) // the named anchor counts, contributes no link
  }

  test("links: href can't be shadowed by other attributes' values") {
    // 'href=' inside title's VALUE must not be read as the attribute;
    // the real href follows
    val e = extract("""<a title="href=/fake" href="/real">x</a>""")
    assert(e.links === Seq("/real"))
    // attribute-name boundary: data-href is not href
    assert(extract("""<a data-href="/no">x</a>""").links === Nil)
    // empty href drops out; whitespace-only too
    assert(extract("""<a href="">x</a><a href="  ">y</a>""").links === Nil)
    // unterminated quote stays total
    assert(extract("""<a href="/unclosed x""").links === Seq("/unclosed x"))
  }

  test("decodeEntities: named, numeric, invalid kept literal") {
    assert(decodeEntities("a=1&amp;b=2") === "a=1&b=2")
    assert(decodeEntities("&#65;&#x42;") === "AB")
    assert(decodeEntities("AT&T &bogus; &#xZZ;") === "AT&T &bogus; &#xZZ;")
    assert(decodeEntities("") === "" && decodeEntities(null) === "")
  }

  test("quote-aware tag scan: '>' inside attribute values") {
    val e = extract("""<a href="/x" title="a>b">More</a> text""")
    assert(e.text === "More text" && e.nLinks === 1)
    assert(extract("""<img alt='2>1'>after""").text === "after")
  }

  test("entities: named, numeric decimal and hex, invalid kept literal") {
    assert(extract("&amp;&lt;tag&gt; &quot;q&quot; &apos;a&apos;").text ===
      "&<tag> \"q\" 'a'")
    assert(extract("&#65;&#x42;&#X43;").text === "ABC")
    assert(extract("a&nbsp;b").text === "a b") // nbsp → plain space
    assert(extract("AT&T &bogus; &#xZZ; 5 &gt 3").text ===
      "AT&T &bogus; &#xZZ; 5 &gt 3")
  }

  test("title captured separately, excluded from text") {
    val e = extract("<head><title> My  Page </title></head><body>body</body>")
    assert(e.title === "My Page" && e.text === "body")
  }

  test("link census counts opening <a> tags only") {
    val e = extract("""<a href="/1">x</a><a href="/2">y</a><abbr>z</abbr>""")
    assert(e.nLinks === 2) // <abbr> is not <a>
  }

  test("escapeHtml → extract is the identity on arbitrary text") {
    val nasty = """5 < 6 && "x" > 'y' <script>alert(1)</script> &amp;"""
    assert(extract("<p>" + escapeHtml(nasty) + "</p>").text ===
      collapseWs(nasty))
  }

  test("null and empty input are total") {
    assert(extract(null) === Extracted("", "", 0, Nil))
    assert(extract("") === Extracted("", "", 0, Nil))
  }

  test("fuzz totality: random byte soup never throws") {
    val rnd = new scala.util.Random(707)
    val alphabet = "<>&;/=\"' abAB#x-!".toCharArray
    (0 until 3000).foreach { _ =>
      val s = Array.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length)))
      extract(new String(s)) // must not throw
    }
  }

  // -------------------------------------------------------- canonical

  test("canonical: <link rel=canonical href> extracted, entities decoded") {
    val e = extract("""<head><link rel="canonical" href="/a?x=1&amp;y=2"></head>""")
    assert(e.canonical === "/a?x=1&y=2")
  }

  test("canonical: first one wins; non-canonical links ignored; case-insensitive rel") {
    val html = """<link rel="stylesheet" href="/s.css">
      |<link rel="Canonical" href="/first">
      |<link rel="canonical" href="/second">""".stripMargin
    assert(extract(html).canonical === "/first")
    assert(extract("""<link href="/x">""").canonical === "")
    assert(extract("no links at all").canonical === "")
  }

  test("canonical: single-quoted and unquoted attribute forms; script regions excluded") {
    assert(extract("<link rel='canonical' href='/sq'>").canonical === "/sq")
    assert(extract("<link rel=canonical href=/uq>").canonical === "/uq")
    val inScript =
      """<script>var s = '<link rel="canonical" href="/evil">';</script>
        |<link rel="canonical" href="/real">""".stripMargin
    assert(extract(inScript).canonical === "/real")
    val inComment =
      """<!-- <link rel="canonical" href="/old"> -->
        |<link rel="canonical" href="/live">""".stripMargin
    assert(extract(inComment).canonical === "/live")
  }

  test("canonical: resolves against the page URL through UrlOps") {
    val e = extract("""<link rel="canonical" href="/item7">""")
    assert(UrlOps.resolve("https://www.page1.com/v2/item7", e.canonical)
      === Some("https://www.page1.com/item7"))
  }

  test("anchors: href + visible text, entities decoded, nested markup stripped") {
    val html =
      """<a href="/a?x=1&amp;y=2">first &amp; best</a>
        |<p>between</p>
        |<a href='/b'><b>bold</b> tail</a>
        |<a name="top">named, no href</a>""".stripMargin
    assert(HtmlExtract.anchors(html) === Seq(
      "/a?x=1&y=2" -> "first & best",
      "/b" -> "bold tail"))
  }

  test("anchors: unclosed anchor ends at the next <a or EOF (browser recovery)") {
    assert(HtmlExtract.anchors(
      """<a href="/one">alpha <a href="/two">beta""") === Seq(
      "/one" -> "alpha", "/two" -> "beta"))
    // script/style bodies never leak into anchor text
    assert(HtmlExtract.anchors(
      """<a href="/x">ok<script>var a = "<a href=evil>";</script> done</a>""")
      === Seq("/x" -> "ok done"))
  }

  test("hreflangs: alternate links only, entities decoded, case-folded langs") {
    val html =
      """<link rel="alternate" hreflang="EN" href="/en/p?a=1&amp;b=2">
        |<link rel='alternate' hreflang='de-AT' href='/de/p'>
        |<link rel="stylesheet" href="/css">
        |<link rel="alternate" href="/no-lang">
        |<link rel="alternate" hreflang="fr" href="">""".stripMargin
    assert(HtmlExtract.hreflangs(html) === Seq(
      "en" -> "/en/p?a=1&b=2", "de-at" -> "/de/p"))
    assert(HtmlExtract.hreflangs(null) === Nil)
    assert(HtmlExtract.hreflangs("<linkage hreflang=x href=y>") === Nil)
  }

  test("anchors: totality on null/garbage; <abbr> is not an anchor") {
    assert(HtmlExtract.anchors(null) === Nil)
    assert(HtmlExtract.anchors("plain text & no tags") === Nil)
    assert(HtmlExtract.anchors("""<abbr title="x">y</abbr>""") === Nil)
    val rnd = new scala.util.Random(5)
    (0 until 500).foreach { _ =>
      val s = (0 until rnd.nextInt(80)).map(_ =>
        "<>&;/ab\"'=x".charAt(rnd.nextInt(11))).mkString
      HtmlExtract.anchors(s) // must not throw
    }
  }

  test("metaRobots: directives, none-equivalence, case, link-level nofollow") {
    import graft.operators.HtmlExtract.{metaRobots, RobotsDirectives}
    assert(metaRobots("""<html><head><meta name="robots" content="noindex, follow"></head></html>""")
      === RobotsDirectives(true, false, false, 0))
    assert(metaRobots("""<meta NAME="ROBOTS" CONTENT="NOFOLLOW,noarchive">""")
      === RobotsDirectives(false, true, true, 0))
    assert(metaRobots("""<meta name="robots" content="none">""")
      === RobotsDirectives(true, true, false, 0))
    // a non-robots meta must not trip it; description content ignored
    assert(metaRobots("""<meta name="description" content="noindex">""")
      === RobotsDirectives(false, false, false, 0))
    val links = """<a href="/a" rel="nofollow">x</a>
      <a href="/b" rel="ugc NOFOLLOW">y</a> <a href="/c">z</a>"""
    assert(metaRobots(links) === RobotsDirectives(false, false, false, 2))
    // commented-out meta is invisible
    assert(metaRobots("""<!-- <meta name="robots" content="noindex"> -->""")
      === RobotsDirectives(false, false, false, 0))
    assert(metaRobots(null) === RobotsDirectives(false, false, false, 0))
  }
}
