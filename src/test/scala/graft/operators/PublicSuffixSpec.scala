package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Expected values follow the publicsuffix.org algorithm spec and its
  * published test vectors (checkPublicSuffix cases), independent of
  * the implementation. */
class PublicSuffixSpec extends AnyFunSuite {
  import PublicSuffix.registeredDomain

  test("exact rules across registry families, any label depth") {
    assert(registeredDomain("www.shop.example.com.sg") === "example.com.sg")
    assert(registeredDomain("news.example.co.nz") === "example.co.nz")
    assert(registeredDomain("www.blog.site3.co.uk") === "site3.co.uk")
    assert(registeredDomain("a.b.c.example.gob.mx") === "example.gob.mx")
    assert(registeredDomain("www.example.ngo.ph") === "example.ngo.ph")
    assert(registeredDomain("x.example.k12.tr") === "example.k12.tr")
    assert(registeredDomain("host.example.ma.us") === "example.ma.us")
  }

  test("longest rule wins: three-label private rules beat two-label") {
    // s3.amazonaws.com is a suffix, so bucket.s3.amazonaws.com is the
    // registrable name — NOT amazonaws.com
    assert(registeredDomain("bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
    assert(registeredDomain("x.bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
    // a sibling label without its own rule groups at .com as usual
    assert(registeredDomain("www.amazonaws.com") === "amazonaws.com")
  }

  test("wildcard rules: every second-level label is a suffix") {
    assert(registeredDomain("www.example.anything.ck") === "example.anything.ck")
    assert(registeredDomain("example.com.np") === "example.com.np")
    assert(registeredDomain("a.b.example.whatever.mm") === "example.whatever.mm")
    // the wildcard-matched label ITSELF is a public suffix
    assert(registeredDomain("anything.ck") === "anything.ck")
  }

  test("exception rule carves www.ck out of *.ck") {
    assert(registeredDomain("www.ck") === "www.ck")
    assert(registeredDomain("a.www.ck") === "www.ck")
    assert(registeredDomain("deep.a.www.ck") === "www.ck")
  }

  test("unknown TLDs take the implicit * default (last two labels)") {
    assert(registeredDomain("a.b.example.com") === "example.com")
    assert(registeredDomain("partner3.example") === "partner3.example")
    assert(registeredDomain("x.partner3.example") === "partner3.example")
  }

  test("degenerate shapes: suffix itself, single label, IP literals") {
    assert(registeredDomain("co.uk") === "co.uk")
    assert(registeredDomain("com.sg") === "com.sg")
    assert(registeredDomain("localhost") === "localhost")
    assert(registeredDomain("192.168.0.1") === "192.168.0.1")
    assert(registeredDomain("[2001:db8::1]") === "[2001:db8::1]")
    assert(registeredDomain("") === "")
  }

  test("hosting platforms: user sites are registrable at the platform") {
    assert(registeredDomain("user.github.io") === "user.github.io")
    assert(registeredDomain("deep.user.github.io") === "user.github.io")
    assert(registeredDomain("myblog.blogspot.com") === "myblog.blogspot.com")
    assert(registeredDomain("app.herokuapp.com") === "app.herokuapp.com")
  }

  test("full rule set loaded: thousands of rules, all three kinds") {
    assert(PublicSuffix.Rules.size > 8000, PublicSuffix.Rules.size)
    assert(PublicSuffix.Wildcards.size > 20, PublicSuffix.Wildcards.size)
    assert(PublicSuffix.Exceptions.size >= 8, PublicSuffix.Exceptions.size)
    // multi-label wildcard parents and their exception carve-outs
    assert(PublicSuffix.Wildcards.contains("kawasaki.jp"))
    assert(PublicSuffix.Exceptions.contains("city.kawasaki.jp"))
    assert(registeredDomain("foo.anything.kawasaki.jp") === "foo.anything.kawasaki.jp")
    assert(registeredDomain("sub.city.kawasaki.jp") === "city.kawasaki.jp")
    // a rare ccTLD registry the hand-audited subset lacked
    assert(registeredDomain("shop.example.com.bn") === "example.com.bn")
  }

  test("official publicsuffix.org test vectors (checkPublicSuffix file)") {
    // The published test file, verbatim from the PSL distribution.
    // Semantics mapping: checkPublicSuffix(host, null) means the host
    // has NO registrable domain (it IS a public suffix, a single
    // label, or malformed) — our total function returns such hosts
    // unchanged, so null-expected well-formed hosts assert identity,
    // and malformed hosts (leading dot = empty label) are skipped as
    // un-parseable by the upstream URL layer. Unicode vectors run in
    // A-label space (UrlOps punycodes hosts before the PSL walk).
    val in = getClass.getResourceAsStream("/graft/test_psl.txt")
    assert(in != null, "missing test resource graft/test_psl.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val Vec = """checkPublicSuffix\('?([^',]*)'?,\s*'?([^');]*)'?\);""".r
    var ran = 0
    try src.getLines().map(_.trim).filter(_.startsWith("checkPublicSuffix")).foreach {
      case Vec(rawIn, rawExp) if rawIn != "null" && !rawIn.startsWith(".") =>
        def ascii(h: String) = {
          val lc = h.toLowerCase
          if (lc.exists(_ > 0x7f)) Punycode.hostToAscii(lc).getOrElse(lc) else lc
        }
        val host = ascii(rawIn)
        val got = registeredDomain(host)
        if (rawExp == "null") assert(got === host, s"vector $rawIn -> null")
        else assert(got === ascii(rawExp), s"vector $rawIn -> $rawExp")
        ran += 1
      case _ => () // null input, leading-dot (malformed host), comments
    } finally src.close()
    assert(ran > 60, s"only $ran vectors ran — parse regression?")
  }
}
