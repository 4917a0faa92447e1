package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Homoglyph skeletons and spoof-domain detection (the UTS #39
 * confusables idea) — the security leg of the crawl plane:
 * `fаlcon.example` with a CYRILLIC а and `fa1con.example` with a
 * digit one both render like `falcon.example`, and a crawler that
 * treats them as distinct sources lets phishing mirrors into the
 * corpus under a trusted domain's reputation. The defense is the
 * skeleton transform: map confusable characters to their ASCII
 * lookalike and flag any domain whose skeleton equals a DIFFERENT
 * existing domain.
 *
 * The mapping covers every confusables class with an ALGORITHMIC
 * block structure in the Unicode charts — fullwidth forms
 * (U+FF01–FF5E, the offset-0xFEE0 mirror of ASCII), the 13 styled
 * mathematical Latin alphabets plus the 5 styled digit runs
 * (U+1D400–1D6A3, U+1D7CE–1D7FF — the `еxample.com` in 𝖾𝗑𝖺𝗆𝗉𝗅𝖾
 * clothing), and enclosed alphanumerics (Ⓐ/ⓐ/⒜) — generated from
 * the block arithmetic, not typed by hand — plus the documented
 * single-char→ASCII confusables for Cyrillic, Greek, Armenian,
 * letterlike symbols, and IPA/dotless Latin from the UTS #39 data
 * (hand-audited constants; this container is egress-free, so the
 * table is BUILT here rather than parsed from a bundled
 * confusables.txt — the generators are the block rules the file
 * itself encodes). The table is transitively CLOSED at construction
 * (𝟢 → '0' → 'o' resolves in one lookup), so `skeleton` is
 * idempotent by construction — a property the spec asserts over the
 * whole table.
 *
 * Hosts are expected lowercase — run after [[UrlOps]] normalization;
 * uppercase sources (enclosed/math capitals) skeleton to lowercase
 * ASCII for that reason.
 *
 * Shape at scale: skeleton is a scan-local per-code-point map (the
 * table is a few hundred entries riding the task binary, not a
 * broadcast concern); detection is ONE equality self-join on the
 * skeleton key over the (distinct, metadata-sized) domain relation.
 */
object Homoglyph {

  /** Hand-audited single-char → ASCII confusables (UTS #39 data,
    * restricted to visually-identical-in-common-fonts pairs). */
  private val handAudited: Map[Int, Char] = Map(
    // Cyrillic lowercase lookalikes (U+04xx, U+05xx)
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
    'х' -> 'x', 'у' -> 'y', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
    'ԛ' -> 'q', 'ԝ' -> 'w', 'ѡ' -> 'w', 'ѵ' -> 'v', 'ԁ' -> 'd',
    'һ' -> 'h', 'ҽ' -> 'e', 'ꭓ' -> 'x',
    // Greek lowercase lookalikes (U+03xx)
    'ο' -> 'o', 'α' -> 'a', 'ι' -> 'i', 'κ' -> 'k', 'ρ' -> 'p',
    'υ' -> 'u', 'ν' -> 'v', 'ϲ' -> 'c', 'ϳ' -> 'j', 'ω' -> 'w',
    // Armenian lowercase lookalikes (U+05xx)
    'հ' -> 'h', 'ո' -> 'n', 'օ' -> 'o', 'ս' -> 'u', 'ց' -> 'g',
    // letterlike symbols (U+21xx): script/fraktur/double-struck
    // single-letter symbols and (numerically, below) the Kelvin sign
    'ℂ' -> 'c', 'ℊ' -> 'g', 'ℋ' -> 'h', 'ℌ' -> 'h', 'ℍ' -> 'h',
    'ℎ' -> 'h', 'ℐ' -> 'i', 'ℑ' -> 'i', 'ℒ' -> 'l', 'ℓ' -> 'l',
    'ℕ' -> 'n', 'ℙ' -> 'p', 'ℚ' -> 'q', 'ℛ' -> 'r', 'ℜ' -> 'r',
    'ℝ' -> 'r', 'ℤ' -> 'z', 'ℬ' -> 'b', 'ℰ' -> 'e', 'ℱ' -> 'f',
    'ℳ' -> 'm', 'ℴ' -> 'o', 'ℯ' -> 'e', 'ℭ' -> 'c', 'ℹ' -> 'i',
    // IPA / dotless / stylistic Latin + small Roman numerals
    'ɡ' -> 'g', 'ı' -> 'i', 'ȷ' -> 'j', 'ɑ' -> 'a', 'ɩ' -> 'i',
    'ʋ' -> 'v', 'ⅰ' -> 'i', 'ⅴ' -> 'v', 'ⅹ' -> 'x', 'ⅼ' -> 'l',
    'ⅽ' -> 'c', 'ⅾ' -> 'd', 'ⅿ' -> 'm',
    // classic ASCII digit substitutions
    '0' -> 'o', '1' -> 'l').map { case (k, v) => (k.toInt, v) } ++ Map(
    0x212A -> 'k') // KELVIN SIGN (typed numerically: the glyph is
                   // indistinguishable from ASCII K in source)

  /** Algorithmic blocks: generated from the chart arithmetic. */
  private val generated: Map[Int, Char] = {
    val b = Map.newBuilder[Int, Char]
    // fullwidth ASCII mirror: U+FF01..FF5E = ASCII + 0xFEE0
    for (cp <- 0xFF01 to 0xFF5E) {
      val ascii = (cp - 0xFEE0).toChar
      b += cp -> (if (ascii >= 'A' && ascii <= 'Z') (ascii + 32).toChar
                  else ascii)
    }
    // mathematical alphanumerics: 13 styled A–Z/a–z alphabets of 52
    // (bold, italic, bold-italic, script, bold-script, fraktur,
    // double-struck, bold-fraktur, sans, sans-bold, sans-italic,
    // sans-bold-italic, monospace); reserved holes (e.g. U+1D455,
    // whose character lives in Letterlike) simply never occur
    for (cp <- 0x1D400 until 0x1D6A4) {
      val off = (cp - 0x1D400) % 52
      b += cp -> (if (off < 26) ('a' + off).toChar
                  else ('a' + (off - 26)).toChar)
    }
    // mathematical digits: 5 styled 0–9 runs (bold, double-struck,
    // sans, sans-bold, monospace)
    for (cp <- 0x1D7CE to 0x1D7FF)
      b += cp -> ('0' + ((cp - 0x1D7CE) % 10)).toChar
    // enclosed alphanumerics: circled A–Z (U+24B6), circled a–z
    // (U+24D0), parenthesized a–z (U+249C)
    for (i <- 0 until 26) {
      b += (0x24B6 + i) -> ('a' + i).toChar
      b += (0x24D0 + i) -> ('a' + i).toChar
      b += (0x249C + i) -> ('a' + i).toChar
    }
    b.result()
  }

  /** Full confusable code point → ASCII skeleton char, transitively
    * closed: if an entry's target is itself a confusable source (a
    * math zero maps to '0', which maps to 'o'), the stored value is
    * the terminal ASCII char. */
  val Table: Map[Int, Char] = {
    val raw = generated ++ handAudited // hand entries win on overlap
    def resolve(c: Char, depth: Int): Char =
      if (depth > 4) c
      else raw.get(c.toInt).map(resolve(_, depth + 1)).getOrElse(c)
    raw.map { case (cp, c) => cp -> resolve(c, 0) }
  }

  def skeleton(host: String): String =
    if (host == null) ""
    else {
      val sb = new java.lang.StringBuilder(host.length)
      var i = 0
      while (i < host.length) {
        val cp = host.codePointAt(i)
        Table.get(cp) match {
          case Some(a) => sb.append(a)
          case None => sb.appendCodePoint(cp)
        }
        i += Character.charCount(cp)
      }
      sb.toString
    }

  /**
   * Spoof card over a domain relation: every DISTINCT domain with its
   * skeleton and `is_spoof` — true iff the skeleton differs from the
   * domain AND matches another existing domain (the impersonation
   * target). The join ships (domain, skeleton) pairs only.
   */
  def spoofCandidates(domains: DataFrame, domainCol: String): DataFrame = {
    val spark = domains.sparkSession
    import spark.implicits._
    val d = domains.select(col(domainCol).cast("string")).as[String]
      .map(h => (h, skeleton(h)))
      .toDF("domain", "skeleton")
      .distinct()
    val targets = d.select(col("domain").as("__target")).distinct()
    d.join(targets,
        col("skeleton") === col("__target") &&
          col("domain") =!= col("__target"), "left")
      .select(col("domain"), col("skeleton"),
        col("__target").isNotNull.as("is_spoof"))
  }
}
