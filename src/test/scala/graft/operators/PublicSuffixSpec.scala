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
}
