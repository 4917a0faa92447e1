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

  /**
   * DPO/RLHF preference-pair prep: per prompt group, the best- and
   * worst-ranked candidates become (chosen, rejected); groups without
   * a strict score margin emit nothing (no preference signal — a pair
   * with margin 0 teaches the wrong thing). ONE hash aggregate with
   * `max_by`/`min_by` over a TOTAL ranking key — no per-group window
   * sort, so the shape is a single exchange on promptCol at any scale.
   *
   * Determinism contract: `max_by`/`min_by` are tie-nondeterministic,
   * so ranking uses rankKey = score·2^20 + (id mod 2^20), a TOTAL
   * order whenever ids are unique within a group (ties on score
   * resolve to the larger id for chosen, smaller for rejected —
   * documented, engine-portable arithmetic).
   *
   * Output: (promptCol, chosen_id, chosen, rejected_id, rejected,
   * margin, n_cands) where margin = max(score) − min(score) — exact
   * integers end to end.
   */
  def dpoPairs(
      cands: DataFrame, promptCol: String, idCol: String,
      textCol: String, scoreCol: String): DataFrame = {
    val key = col(scoreCol) * lit(1048576L) + col(idCol) % lit(1048576L)
    cands.groupBy(col(promptCol)).agg(
      max_by(col(idCol), key).as("chosen_id"),
      max_by(col(textCol), key).as("chosen"),
      min_by(col(idCol), key).as("rejected_id"),
      min_by(col(textCol), key).as("rejected"),
      (max(col(scoreCol)) - min(col(scoreCol))).as("margin"),
      count(lit(1)).as("n_cands"))
      .filter(col("margin") > 0)
  }
}
