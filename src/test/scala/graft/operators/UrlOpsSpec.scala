package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  import UrlOps._

  test("parse: scheme/host/port/path/query/fragment split") {
    val u = parse("https://user:pw@Host.Example.com:8443/a/b?x=1&y=2#frag").get
    assert(u.scheme === "https" && u.host === "Host.Example.com")
    assert(u.port === 8443 && u.path === "/a/b")
    assert(u.query === "x=1&y=2" && u.fragment === "frag")
  }

  test("parse: missing parts default; malformed → None") {
    val u = parse("http://h").get
    assert(u.port === -1 && u.path === "" && u.query === "" && u.fragment === "")
    assert(parse(null).isEmpty)
    assert(parse("no-scheme/path").isEmpty)
    assert(parse("://h").isEmpty)
    assert(parse("1http://h").isEmpty)       // scheme must start with a letter
    assert(parse("http://").isEmpty)         // empty host
    assert(parse("http://h:99999999").isEmpty) // port overflow
    assert(parse("http://h:12ab").isEmpty)   // non-numeric port
  }

  test("normalize: case, default ports, fragment, userinfo") {
    assert(normalize("HTTP://WWW.Example.COM:80/A#top").get ===
      "http://www.example.com/A")
    assert(normalize("https://u@host.org:443/").get === "https://host.org/")
    // non-default port survives
    assert(normalize("http://h:8080/x").get === "http://h:8080/x")
    // empty path → "/"
    assert(normalize("http://h").get === "http://h/")
  }

  test("normalize: percent-encoding — unreserved decoded, rest upper hex") {
    assert(normalizePercent("p%41ge%2fq%7e") === "pAge%2Fq~")
    assert(normalizePercent("%zz%4") === "%zz%4") // malformed kept literal
    assert(normalize("http://h/p%41th").get === "http://h/pAth")
  }

  test("normalize: dot-segment removal per RFC 3986") {
    assert(removeDotSegments("/a/./b/../c") === "/a/c")
    assert(removeDotSegments("/a/b/..") === "/a/")   // keeps directory slash
    assert(removeDotSegments("/../a") === "/a")      // .. at root is a no-op
    assert(removeDotSegments("/a//b/") === "/a/b/")  // empty segments dropped
    assert(removeDotSegments("") === "/")
    assert(normalize("http://h/a/./x/../b").get === "http://h/a/b")
  }

  test("normalize: tracking params stripped, remainder sorted stably") {
    assert(normalize("http://h/p?utm_source=x&b=2&utm_campaign=y&a=1").get ===
      "http://h/p?a=1&b=2")
    assert(normalize("http://h/p?fbclid=F&gclid=G&id=7").get ===
      "http://h/p?id=7")
    // all params tracking → '?' dropped entirely
    assert(normalize("http://h/p?utm_medium=m").get === "http://h/p")
    // bare key vs empty value both survive verbatim
    assert(normalize("http://h/p?flag&z=&a=1").get === "http://h/p?a=1&flag&z=")
  }

  test("parse: bracketed IPv6 literals keep their colons out of the port") {
    val u = parse("http://[::1]:8080/p").get
    assert(u.host === "[::1]" && u.port === 8080 && u.path === "/p")
    val v = parse("https://[2001:DB8::1]/x").get
    assert(v.host === "[2001:DB8::1]" && v.port === -1)
    assert(normalize("HTTP://[2001:DB8::1]:80/x").get === "http://[2001:db8::1]/x")
    assert(parse("http://[::1/p").isEmpty)      // unclosed bracket
    assert(parse("http://[]/p").isEmpty)        // empty literal
    assert(parse("http://[::1]8080/p").isEmpty) // junk between ] and port
  }

  test("normalize: bare ref= survives (content-selecting, not tracking)") {
    assert(normalize("http://h/p?ref=docs&utm_source=x").get ===
      "http://h/p?ref=docs")
    assert(normalize("http://h/p?ref_src=twsrc&id=1").get === "http://h/p?id=1")
  }

  test("registeredDomain: two-part suffixes, unknown TLDs, edge shapes") {
    assert(registeredDomain("www.blog.site3.co.uk") === "site3.co.uk")
    assert(registeredDomain("a.b.example.com") === "example.com")
    assert(registeredDomain("user.github.io") === "user.github.io")
    assert(registeredDomain("Example.COM.") === "example.com")
    assert(registeredDomain("localhost") === "localhost")
    assert(registeredDomain("co.uk") === "co.uk") // the suffix itself: 2 labels
  }

  test("resolve: every reference form against a base page URL") {
    val base = "https://www.ex.com:8443/a/b/page?q=1#frag"
    assert(resolve(base, "https://other.org/z") === Some("https://other.org/z"))
    assert(resolve(base, "//cdn.ex.com/img") === Some("https://cdn.ex.com/img"))
    assert(resolve(base, "/root/x") === Some("https://www.ex.com:8443/root/x"))
    assert(resolve(base, "sib") === Some("https://www.ex.com:8443/a/b/sib"))
    assert(resolve(base, "../up?x=2") === Some("https://www.ex.com:8443/a/up?x=2"))
    assert(resolve(base, "./same") === Some("https://www.ex.com:8443/a/b/same"))
    assert(resolve(base, "?page=2") ===
      Some("https://www.ex.com:8443/a/b/page?page=2"))
    assert(resolve(base, "#sec") ===
      Some("https://www.ex.com:8443/a/b/page?q=1#sec"))
    assert(resolve(base, "") === Some("https://www.ex.com:8443/a/b/page?q=1"))
    // pseudo-links come back as-is (and then fail parse/normalize)
    assert(resolve(base, "mailto:x@y.z") === Some("mailto:x@y.z"))
    assert(resolve(base, "javascript:void(0)") === Some("javascript:void(0)"))
    // pathless base: merge against "/"
    assert(resolve("http://h", "x") === Some("http://h/x"))
    // unparseable base
    assert(resolve("not a url", "/x") === None)
    assert(resolve(base, null) === None)
  }

  test("fuzz totality: arbitrary strings never throw") {
    val rnd = new scala.util.Random(909)
    val alphabet = ":/?#@&=%.ab12~_-".toCharArray
    (0 until 3000).foreach { _ =>
      val s = Array.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length)))
      val str = new String(s)
      parse(str); normalize(str)                       // must not throw
      resolve("https://h.example/a/b?q=1", str)        // ref fuzz
      resolve(str, "../x")                             // base fuzz
    }
  }
}
