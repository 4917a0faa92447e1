package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode canonicalization kernels — the text-normalization pass a
 * C4/CCNet-style curation pipeline runs before tokenizing, hashing, or
 * deduplicating: the SAME text arrives from different sources in
 * composed (é) and decomposed (e + U+0301) forms, and every
 * fingerprint operator downstream (simhash, minhash, md5 exact-dedup)
 * treats those as different documents unless the corpus is
 * canonicalized first.
 *
 * Both kernels delegate to the JDK's `java.text.Normalizer` (an
 * implementation of Unicode Standard Annex #15 — the same spec
 * utf8proc implements, which is what makes the DuckDB oracle's
 * `nfc_normalize`/`strip_accents` cross-engine checkable):
 *  - `nfc_normalize`: canonical decomposition + canonical composition
 *    (NFC), the web's canonical form (W3C charmod-norm).
 *  - `strip_accents`: NFD + drop combining marks (general category
 *    Mn) — the CCNet/fastText convention for accent-insensitive
 *    fingerprints; pure-ASCII text passes through unchanged.
 *
 * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
 * almost always true on real corpora (crawl text is overwhelmingly
 * already NFC), so the normalize-allocating path is the exception,
 * not the rule. Both are scan-local scalar kernels — they ride
 * WholeStageCodegen like every other text kernel here.
 */
object UnicodeKernels {

  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (!hasMark && i < nfd.length) {
      if (Character.getType(nfd.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) { if (nfd == str) s else UTF8String.fromString(nfd) }
    else {
      val sb = new java.lang.StringBuilder(nfd.length)
      i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** `nfc_normalize(text)` → NFC-canonicalized text (UAX #15). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.nfcNormalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfcNormalize($c)")

  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `strip_accents(text)` → NFD + combining marks removed. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.stripAccents($c)")

  override def prettyName: String = "strip_accents"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
