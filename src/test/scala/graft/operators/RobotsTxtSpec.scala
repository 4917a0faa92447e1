package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Expected values follow RFC 9309's own examples (§2.2.2, §5) and
  * the publicly documented pattern-matching tables, independent of
  * the implementation. */
class RobotsTxtSpec extends AnyFunSuite {
  import RobotsTxt._

  test("parse: groups, comments, unknown fields, crlf, case") {
    val r = parse(
      "# policy\r\n" +
        "User-Agent: GraftBot # inline comment\r\n" +
        "DISALLOW: /a\r\n" +
        "weird-field: ignored\r\n" +
        "\r\n" +
        "User-agent: one\r\n" +
        "User-agent: two\r\n" +
        "Allow: /b\r\n" +
        "Sitemap: https://h.example/sitemap.xml\r\n")
    assert(r.groups.size === 2)
    assert(r.groups(0).agents === Seq("graftbot"))
    assert(r.groups(0).rules === Seq(Rule(false, "/a")))
    // consecutive user-agent lines share ONE group
    assert(r.groups(1).agents === Seq("one", "two"))
    assert(r.groups(1).rules === Seq(Rule(true, "/b")))
    assert(r.sitemaps === Seq("https://h.example/sitemap.xml"))
    // empty Disallow value = matches nothing = absent rule
    assert(parse("User-agent: *\nDisallow:\n").groups.head.rules === Nil)
    assert(parse(null) === AllowAll)
    assert(parse("") === AllowAll)
  }

  test("matches: the RFC/Google pattern table") {
    assert(matches("/", "/anything"))
    assert(matches("/fish", "/fish"))
    assert(matches("/fish", "/fishheads"))
    assert(matches("/fish", "/fish/salmon.html"))
    assert(!matches("/fish", "/Fish.asp")) // octet match is case-sensitive
    assert(matches("/fish*", "/fishheads/yummy.html"))
    assert(matches("/fish/", "/fish/salmon"))
    assert(!matches("/fish/", "/fish"))
    assert(matches("/*.php", "/folder/filename.php"))
    assert(matches("/*.php", "/filename.php?parameters"))
    assert(!matches("/*.php", "/windows.PHP"))
    assert(matches("/*.php$", "/filename.php"))
    assert(!matches("/*.php$", "/filename.php?parameters"))
    assert(!matches("/*.php$", "/filename.php5"))
    assert(matches("/fish*.php", "/fishheads/catfish.php?p=2"))
    assert(!matches("/fish*.php", "/Fish.PHP"))
    assert(matches("/p$", "/p"))
    assert(!matches("/p$", "/pq"))
    assert(!matches("", "/x")) // empty pattern matches nothing
  }

  test("precedence: longest pattern wins, allow breaks ties") {
    val r = parse(
      """User-agent: *
        |Allow: /p
        |Disallow: /
        |""".stripMargin)
    assert(isAllowed(r, "any", "/page"))     // /p (2) beats / (1)
    assert(!isAllowed(r, "any", "/quote"))   // only / matches
    val tie = parse(
      """User-agent: *
        |Allow: /folder
        |Disallow: /folder
        |""".stripMargin)
    assert(isAllowed(tie, "any", "/folder/page")) // equal length → Allow
    val anchored = parse(
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/ok$
        |""".stripMargin)
    assert(isAllowed(anchored, "any", "/private/ok")) // 12 > 9
    assert(!isAllowed(anchored, "any", "/private/ok2")) // anchor fails → 9 only
  }

  test("group selection: one group only, most specific agent, * default") {
    val r = parse(
      """User-agent: graftbot
        |Allow: /private/graft/
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /tmp*
        |Crawl-delay: 2
        |""".stripMargin)
    // named group is exclusive: graftbot does NOT inherit /tmp*
    assert(isAllowed(r, "graftbot/1.0", "/tmpfile"))
    assert(!isAllowed(r, "otherbot", "/tmpfile"))
    assert(isAllowed(r, "graftbot/1.0", "/private/graft/x"))
    assert(!isAllowed(r, "graftbot/1.0", "/private/x"))
    assert(crawlDelay(r, "otherbot") === Some(2.0))
    assert(crawlDelay(r, "graftbot/1.0") === None)
    // no matching group at all → everything allowed
    val named = parse("User-agent: other\nDisallow: /\n")
    assert(isAllowed(named, "graftbot", "/anything"))
    // longest agent token wins
    val two = parse(
      "User-agent: graft\nDisallow: /a\n\nUser-agent: graftbot\nAllow: /a\n")
    assert(isAllowed(two, "graftbot-img/2.1", "/a"))
  }

  test("fuzz totality: arbitrary robots bodies and paths never throw") {
    val rnd = new scala.util.Random(4242)
    val alphabet = ":/*$#\n\r ab-AB12.".toCharArray
    (0 until 2000).foreach { _ =>
      val body = new String(
        Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))))
      val r = parse(body) // must not throw
      isAllowed(r, "graftbot", "/a/*b$c")
      matches(new String(Array.fill(rnd.nextInt(20))(
        alphabet(rnd.nextInt(alphabet.length)))), "/x/y")
    }
  }
}
