package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mojibake (encoding-damage) triage — the ftfy-class fixer every web
 * training corpus needs (Speer, "ftfy: fixes text for you", public
 * tool/paper): UTF-8 bytes misdecoded as Latin-1 leave an unmistakable
 * signature, a LEAD char in U+00C2/U+00C3 (2-byte sequences covering
 * U+0080–U+00FF: "Ã©" for é) or U+00E2 (the 3-byte general-punctuation
 * block: "â€”" for —) followed by chars in the CONTINUATION range
 * U+0080–U+00BF. Legitimate Latin-1 text almost never puts Â/Ã/â
 * before a C1 control or spacing mark, which is what makes the bigram
 * a high-precision detector.
 *
 * [[card]] is the detection/routing pass (scan-local, one regex
 * kernel per row — no shuffle beyond the caller's); [[repairLatin1]]
 * is the per-string repair kernel: re-interpret chars ≤ U+00FF as
 * bytes and re-decode WELL-FORMED UTF-8 sequences in place, leaving
 * everything else untouched (never destructive on clean text — the
 * ftfy contract). At 100 TB the card routes; repair runs only on the
 * flagged slice.
 */
object Mojibake {

  /** Detection signature: misdecode lead (Â Ã â) + continuation char. */
  val Signature = "[\u00C2\u00C3\u00E2][\u0080-\u00BF]"
  private val Continuation = "[\u0080-\u00BF]"

  /**
   * Per-document mojibake card: signature bigram count, raw
   * continuation-range char count (lone continuations — damage the
   * bigram can't anchor — show up as cont_chars > hits), and the
   * routing flag. Pure scan-local projection.
   */
  def card(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(Signature)).cast("long").as("moji_hits"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), Continuation, "")))
        .cast("long").as("cont_chars"),
      (regexp_count(col(textCol), lit(Signature)) >= 1).as("flagged"))

  /**
   * Repair one Latin-1-misdecoded string: chars ≤ U+00FF are treated
   * as the bytes they came from; maximal well-formed UTF-8 sequences
   * (2-byte C2–DF, 3-byte E0–EF, 4-byte F0–F4, with range-valid
   * continuations) are re-decoded, everything else copies through
   * verbatim. Clean ASCII/Unicode text is a fixed point; repairing
   * the misdecode of any valid UTF-8 string returns the original.
   * Surrogate-range (U+D800–DFFF) and over-long decodes are refused —
   * those sequences copy through undamaged.
   */
  def repairLatin1(s: String): String = {
    if (s == null) return null
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    def cont(j: Int): Boolean =
      j < n && s.charAt(j) >= 0x80 && s.charAt(j) <= 0xBF
    while (i < n) {
      val c = s.charAt(i).toInt
      if (c >= 0xC2 && c <= 0xDF && cont(i + 1)) {
        out.appendCodePoint(((c & 0x1F) << 6) | (s.charAt(i + 1) & 0x3F))
        i += 2
      } else if (c >= 0xE0 && c <= 0xEF && cont(i + 1) && cont(i + 2)) {
        val cp = ((c & 0x0F) << 12) | ((s.charAt(i + 1) & 0x3F) << 6) |
          (s.charAt(i + 2) & 0x3F)
        // refuse over-longs (< 0x800) and surrogates — copy verbatim
        if (cp >= 0x800 && (cp < 0xD800 || cp > 0xDFFF)) {
          out.appendCodePoint(cp); i += 3
        } else { out.append(s.charAt(i)); i += 1 }
      } else if (c >= 0xF0 && c <= 0xF4 && cont(i + 1) && cont(i + 2) &&
          cont(i + 3)) {
        val cp = ((c & 0x07) << 18) | ((s.charAt(i + 1) & 0x3F) << 12) |
          ((s.charAt(i + 2) & 0x3F) << 6) | (s.charAt(i + 3) & 0x3F)
        if (cp >= 0x10000 && cp <= 0x10FFFF) {
          out.appendCodePoint(cp); i += 4
        } else { out.append(s.charAt(i)); i += 1 }
      } else {
        out.append(s.charAt(i)); i += 1
      }
    }
    out.toString
  }
}
