package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth: the JDK's independent `java.net.IDN` (IDNA2003)
  * implementation, plus the widely published xn-- encodings. The fuzz
  * alphabet avoids characters IDNA's nameprep maps (ß→ss, uppercase,
  * combining marks), so both implementations encode the identical
  * codepoint sequence and must agree exactly. */
class PunycodeSpec extends AnyFunSuite {
  import Punycode._

  test("published label encodings") {
    assert(encode("bücher") === Some("bcher-kva"))
    assert(encode("münchen") === Some("mnchen-3ya"))
    assert(encode("café") === Some("caf-dma"))
    assert(hostToAscii("www.münchen.de") === Some("www.xn--mnchen-3ya.de"))
    assert(hostToAscii("ascii.example.com") === Some("ascii.example.com"))
  }

  test("agrees with java.net.IDN on mixed-script labels") {
    val pools = Seq(
      "abcxyz0189",          // basic
      "àáâãäåèéêëìíîïñòóôöùúûüýÿ", // Latin-1 letters
      "αβγδεζηθικλμνξοπρστυφχψω",  // Greek lowercase
      "абвгдежзиклмнопрстуфхцчшщэюя") // Cyrillic lowercase
    val rnd = new scala.util.Random(606)
    (0 until 3000).foreach { _ =>
      val pool = pools(rnd.nextInt(pools.length)) +
        pools(rnd.nextInt(pools.length))
      val label = new String(Array.fill(1 + rnd.nextInt(20))(
        pool.charAt(rnd.nextInt(pool.length))))
      if (label.exists(_ >= 128)) {
        val expected =
          try Some(java.net.IDN.toASCII(label)) catch { case _: Exception => None }
        expected.foreach { exp =>
          assert(("xn--" + encode(label).get) === exp, s"label [$label]")
        }
      }
    }
  }

  test("decode inverts encode, including basic/delimiter edge shapes") {
    val labels = Seq("bücher", "münchen", "café", "ab-cü", "üüü", "ü",
      "x-y-zü9", "αβγ-δε", "mix0ж9")
    labels.foreach { l =>
      val enc = encode(l).get
      assert(decode(enc) === Some(l), s"round trip [$l] via [$enc]")
    }
    val rnd = new scala.util.Random(707)
    val pool = "abz019-üéжλ"
    (0 until 2000).foreach { _ =>
      val l = new String(Array.fill(1 + rnd.nextInt(16))(
        pool.charAt(rnd.nextInt(pool.length))))
      if (l.exists(_ >= 128))
        assert(decode(encode(l).get) === Some(l), s"[$l]")
    }
  }

  test("decode is total on junk") {
    assert(decode("!!bad digits!!").isEmpty)
    assert(decode("a-") === Some("a")) // empty digit run after delimiter
    val rnd = new scala.util.Random(808)
    val pool = "abz019-AZ!."
    (0 until 2000).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(20))(
        pool.charAt(rnd.nextInt(pool.length))))
      decode(s) // must not throw
    }
  }

  test("normalize and registeredDomain see IDN and xn-- hosts as one key") {
    assert(UrlOps.normalize("http://MÜNCHEN.de/weg").get ===
      "http://xn--mnchen-3ya.de/weg")
    assert(UrlOps.normalize("http://xn--mnchen-3ya.de/weg").get ===
      "http://xn--mnchen-3ya.de/weg")
    assert(UrlOps.registeredDomain("www.münchen.de") === "xn--mnchen-3ya.de")
    assert(UrlOps.registeredDomain("www.xn--mnchen-3ya.de") === "xn--mnchen-3ya.de")
  }
}
