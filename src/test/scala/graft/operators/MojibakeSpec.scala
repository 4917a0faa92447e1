package graft.operators

import graft.SparkFunSuite

class MojibakeSpec extends SparkFunSuite {

  // "café" with é misdecoded: C3 A9 → Ã©
  private val Moji2 = "cafÃ©"
  // "em—dash" with — misdecoded: E2 80 94 → â + U+0080 + U+0094
  private val Moji3 = "em\u00E2\u0080\u0094dash"

  test("card: clean ASCII and legit Latin-1 text are not flagged") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "legit Ã alone before ascii"), // Ã + space: no bigram
      (3L, "café déjà vu"))     // real accents, no lead+cont
      .toDF("id", "text")
    val r = Mojibake.card(df, "id", "text").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(3))).toMap
    assert(r(1L) === ((0L, false)))
    assert(r(2L) === ((0L, false)))
    assert(r(3L) === ((0L, false)))
  }

  test("card: 2-byte and 3-byte misdecodes count per signature bigram") {
    import spark.implicits._
    val df = Seq(
      (1L, s"$Moji2 and $Moji2"),  // 2 hits, 2 continuation chars
      (2L, Moji3))                 // 1 hit (â+0x80), 2 continuation chars
      .toDF("id", "text")
    val r = Mojibake.card(df, "id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3))))
      .toMap
    assert(r(1L) === ((2L, 2L, true)))
    assert(r(2L) === ((1L, 2L, true)))
  }

  test("repairLatin1: inverts the Latin-1 misdecode of any UTF-8 string") {
    import java.nio.charset.StandardCharsets
    for (orig <- Seq(
        "café déjà vu",
        "em—dash… and “quotes”",
        "naïve über ASCII mix",
        "emoji 😀 tail",
        "日本語テキスト")) {
      val mangled = new String(
        orig.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)
      assert(Mojibake.repairLatin1(mangled) === orig, s"orig=$orig")
    }
  }

  test("repairLatin1: clean text is a fixed point; invalid sequences survive") {
    assert(Mojibake.repairLatin1("plain ascii") === "plain ascii")
    val unicode = "真のユニコード"
    assert(Mojibake.repairLatin1(unicode) === unicode)
    assert(Mojibake.repairLatin1(null) === null)
    // lone lead (no continuation) copies through
    assert(Mojibake.repairLatin1("xÃ y") === "xÃ y")
    // over-long 3-byte (E0 80 80 would decode < 0x800) survives
    val overlong = "\u00E0\u0080\u0080"
    assert(Mojibake.repairLatin1(overlong) === overlong)
    // surrogate-range 3-byte (ED A0 80 → U+D800) survives
    val surrogate = "\u00ED\u00A0\u0080"
    assert(Mojibake.repairLatin1(surrogate) === surrogate)
  }
}
