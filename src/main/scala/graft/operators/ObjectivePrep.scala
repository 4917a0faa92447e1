package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-objective data preparation — the step after curation that
 * turns clean text into (input, target) supervision pairs. Beside
 * [[SequencePacking]] (causal LM) and [[ChatFormat]] (SFT), this
 * covers the masked-LM denoising objective: a deterministic fraction
 * of token positions is replaced by a mask sentinel in the input, and
 * the masked tokens (with their positions) become the target.
 *
 * Mask selection is pure column arithmetic on md5(doc_id:pos) — the
 * same engine-portable seeded-hash trick as [[DatasetSplit]]: every
 * rerun, partition layout, and engine picks the SAME positions, so a
 * training restart never sees a different corruption of the same doc
 * (and an oracle can re-derive the pair exactly). One scan-local
 * projection of array HOFs — no shuffle, no UDF, no RNG state.
 */
object ObjectivePrep {

  val MaskToken = "[MASK]"

  /** 4-nibble md5 value of (id, 1-based position) — uniform 0..65535,
    * identically computable in any engine with md5 + string ops. */
  private def posHash(id: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(id.cast("string"), lit(":"), pos.cast("string"))),
      1, 4), 16, 10).cast("long")

  /**
   * BERT-style single-token masking at rate 1/`oneIn`: input keeps the
   * token order with masked positions replaced by [[MaskToken]]; the
   * target lists the masked tokens in position order. Output:
   * (id, n_tokens, n_masked, input_text, target_text).
   */
  def mlmCorruption(
      docs: DataFrame, idCol: String, textCol: String,
      oneIn: Int = 7): DataFrame = {
    require(oneIn >= 2, s"mask rate 1/$oneIn")
    val toks = split(col(textCol), " ")
    val idxs = sequence(lit(1), size(toks))
    val flags = transform(idxs, p => posHash(col(idCol), p) % oneIn === 0)
    val masked = zip_with(toks, flags, (t, f) =>
      when(f, lit(MaskToken)).otherwise(t))
    val targets = zip_with(toks, flags, (t, f) => when(f, t))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      aggregate(flags, lit(0L), (acc, f) =>
        acc + when(f, 1L).otherwise(0L)).as("n_masked"),
      concat_ws(" ", masked).as("input_text"),
      concat_ws(" ", filter(targets, t => t.isNotNull)).as("target_text"))
  }
}
