package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.Charset

class CharsetSniffSpec extends AnyFunSuite {
  import CharsetSniff._

  test("fromContentType: charset parameter forms") {
    assert(fromContentType("text/html; charset=utf-8") === Some("utf-8"))
    assert(fromContentType("text/html; charset=UTF-8; boundary=x") === Some("UTF-8"))
    assert(fromContentType("text/html;charset=\"iso-8859-1\"") === Some("iso-8859-1"))
    assert(fromContentType("text/html; charset = 'windows-1251'") === Some("windows-1251"))
    assert(fromContentType("text/html") === None)
    assert(fromContentType("") === None)
    assert(fromContentType(null) === None)
    // `charset` token without a value
    assert(fromContentType("text/html; charset=") === None)
  }

  test("fromMeta: both attribute forms, case-insensitive, windowed") {
    assert(fromMeta("<html><head><meta charset=\"utf-8\"></head>".getBytes) ===
      Some("utf-8"))
    assert(fromMeta("<META CHARSET=KOI8-R>".getBytes) === Some("KOI8-R"))
    assert(fromMeta(("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1251\">").getBytes) ===
      Some("windows-1251"))
    assert(fromMeta("<p>no declaration here</p>".getBytes) === None)
    // declaration past the 1024-byte prescan window is not seen
    val late = (" " * 1100) + "<meta charset=\"utf-8\">"
    assert(fromMeta(late.getBytes) === None)
    assert(fromMeta(Array.empty[Byte]) === None)
    assert(fromMeta(null) === None)
  }

  test("fromBom: the three marks, with lengths") {
    assert(fromBom(Array(0xEF, 0xBB, 0xBF, 'a').map(_.toByte))
      .map { case (cs, n) => (cs.name, n) } === Some(("UTF-8", 3)))
    assert(fromBom(Array(0xFF, 0xFE, 'a', 0).map(_.toByte))
      .map { case (cs, n) => (cs.name, n) } === Some(("UTF-16LE", 2)))
    assert(fromBom(Array(0xFE, 0xFF, 0, 'a').map(_.toByte))
      .map { case (cs, n) => (cs.name, n) } === Some(("UTF-16BE", 2)))
    assert(fromBom("plain".getBytes) === None)
  }

  test("decode priority: BOM > HTTP header > meta > fallback") {
    // BOM wins over a lying meta AND a lying header
    val bomPage = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<meta charset=\"iso-8859-1\">Ω".getBytes(Charset.forName("UTF-8"))
    val d1 = decode(bomPage, "text/html; charset=windows-1251")
    assert(d1.charset === "UTF-8" && d1.source === "bom")
    assert(d1.text.endsWith("Ω") && !d1.text.startsWith("﻿")) // BOM stripped
    // header wins over meta
    val page2 = "<meta charset=\"windows-1251\">café"
      .getBytes(Charset.forName("UTF-8"))
    val d2 = decode(page2, "text/html; charset=utf-8")
    assert(d2.charset === "UTF-8" && d2.source === "http" && d2.text.endsWith("café"))
    // meta when the header has no charset
    val page3 = "<meta charset=\"windows-1251\">Дж ok"
      .getBytes(Charset.forName("windows-1251"))
    val d3 = decode(page3, "text/html")
    assert(d3.charset === "windows-1251" && d3.source === "meta")
    assert(d3.text.contains("Дж"))
    // nothing declared → ISO-8859-1, total on any byte
    val d4 = decode(Array(0xE9, 0xFC, 0x41).map(_.toByte), "")
    assert(d4.charset === "ISO-8859-1" && d4.source === "fallback")
    assert(d4.text === "éüA")
  }

  test("unknown labels fall through to the next source") {
    // header label bogus → meta consulted
    val page = "<meta charset=\"iso-8859-1\">é".getBytes(Charset.forName("ISO-8859-1"))
    val d = decode(page, "text/html; charset=x-not-a-charset")
    assert(d.charset === "ISO-8859-1" && d.source === "meta")
    // both bogus → fallback
    val d2 = decode("<meta charset=\"also-bogus\">hi".getBytes, "text/html; charset=nope")
    assert(d2.charset === "ISO-8859-1" && d2.source === "fallback")
    assert(resolve("") === None && resolve(null) === None)
    assert(resolve("not a charset!").isEmpty) // illegal name chars must not throw
  }

  test("UTF-16 BOM pages decode through the full path") {
    // getBytes(UTF-16LE) emits no BOM, so lead with U+FEFF: under
    // UTF-16LE it serializes to the FF FE mark itself
    val bytes = "﻿hello Ж".getBytes(Charset.forName("UTF-16LE"))
    val d = decode(bytes, "text/html")
    assert(d.charset === "UTF-16LE" && d.source === "bom")
    assert(d.text === "hello Ж")
  }

  test("fuzz totality: arbitrary bytes and header strings never throw") {
    val rnd = new scala.util.Random(1717)
    val headerChars = "abcdefgh;=, \"'%-_ABCDEFGH0123456789".toCharArray
    (0 until 2000).foreach { _ =>
      val body = new Array[Byte](rnd.nextInt(128))
      rnd.nextBytes(body)
      val header = new String(
        Array.fill(rnd.nextInt(40))(headerChars(rnd.nextInt(headerChars.length))))
      val d = decode(body, header) // must not throw
      assert(d.text != null && d.charset.nonEmpty)
    }
  }
}
