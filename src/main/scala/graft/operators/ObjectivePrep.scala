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

  /**
   * BERT-style single-token masking at rate 1/`oneIn`: input keeps the
   * token order with masked positions replaced by [[MaskToken]]; the
   * target lists the masked tokens in position order. Output:
   * (id, n_tokens, n_masked, input_text, target_text).
   *
   * One `mlm_mask` codegen kernel call per row (split, hash, mask and
   * both joins in a single byte pass) — the previous formulation built
   * the same fields from three CodegenFallback HOFs (`transform` +
   * 2×`zip_with` + `aggregate`) per row, ~5× the per-row cost;
   * `NgramMlmKernelsSpec` pins kernel ≡ HOF including NULL
   * degradation (`NgramMlmPlanSpec` guards the plan shape). The
   * struct is projected once and fields are extracted in a second
   * Project (multiple references stop CollapseProject from inlining
   * the kernel four times).
   */
  def mlmCorruption(
      docs: DataFrame, idCol: String, textCol: String,
      oneIn: Int = 7): DataFrame = {
    require(oneIn >= 2, s"mask rate 1/$oneIn")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol),
      graft.functions.GraftFunctions.mlmMask(
        col(idCol).cast("string"), col(textCol), oneIn).as("__m"))
      .select(
        col(idCol),
        col("__m.n_tokens").as("n_tokens"),
        col("__m.n_masked").as("n_masked"),
        col("__m.input_text").as("input_text"),
        col("__m.target_text").as("target_text"))
  }

  /** FIM sentinels (public-recipe spelling, Bavarian et al. 2022). */
  val FimPre = "<PRE>"
  val FimSuf = "<SUF>"
  val FimMid = "<MID>"

  /** Salted 4-nibble doc hash for FIM decisions: md5(id:fim:k). */
  private def fimHash(id: org.apache.spark.sql.Column, k: Int) =
    SeededHash.md5Nibbles(concat(id.cast("string"), lit(s":fim:$k")), 4)

  /**
   * Fill-in-the-Middle corruption (Bavarian et al. 2022, "Efficient
   * Training of Language Models to Fill in the Middle"): on a
   * deterministic half of the corpus (md5-seeded, like every split in
   * this package), pick token cut points 0 ≤ a ≤ b ≤ n−1 and emit the
   * PSM reordering `<PRE> prefix <SUF> suffix <MID> middle`; the
   * other half passes through verbatim — the standard 50/50 FIM-rate
   * recipe. Cut points are per-document md5 arithmetic (a = h1 mod n,
   * b = a + h2 mod (n−a)), so reruns, engines and partitionings agree
   * on every byte; the suffix is never empty by construction.
   *
   * Scan-local projection — array slices of the token split, no
   * shuffle, no state. Output: (id, fim_applied, n_tokens, p_len,
   * m_len, s_len, out_md5) — the md5 stands in for the transformed
   * text so downstream hashes stay narrow; swap it for the string
   * column when materializing.
   */
  def fimCorruption(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    val apply = n >= 3 && fimHash(col(idCol), 0) % 2 === 0
    val a = fimHash(col(idCol), 1) % n
    val b = a + fimHash(col(idCol), 2) % (n - a)
    val pstr = concat_ws(" ", slice(toks, lit(1), a.cast("int")))
    val mstr = concat_ws(" ",
      slice(toks, (a + 1).cast("int"), (b - a).cast("int")))
    val sstr = concat_ws(" ",
      slice(toks, (b + 1).cast("int"), (n - b).cast("int")))
    val psm = concat_ws(" ", lit(FimPre), pstr, lit(FimSuf), sstr,
      lit(FimMid), mstr)
    docs.select(
      col(idCol),
      apply.as("fim_applied"),
      n.as("n_tokens"),
      when(apply, a).otherwise(0L).as("p_len"),
      when(apply, b - a).otherwise(0L).as("m_len"),
      when(apply, n - b).otherwise(0L).as("s_len"),
      md5(when(apply, psm).otherwise(col(textCol)).cast("binary"))
        .as("out_md5"))
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

  /** Salted 4-nibble doc hash for ICT decisions: md5(id:ict:k). */
  private def ictHash(id: org.apache.spark.sql.Column, k: Int) =
    SeededHash.md5Nibbles(concat(id.cast("string"), lit(s":ict:$k")), 4)

  /**
   * Inverse Cloze Task pair generation (Lee et al. 2019, "Latent
   * Retrieval for Weakly Supervised Open Domain Question Answering") —
   * the retriever-pretraining objective: one segment of a document
   * becomes the pseudo-QUERY, the remaining segments its
   * pseudo-evidence CONTEXT. With probability 1/`keepOneIn` the query
   * segment is also KEPT in the context (the paper's trick that
   * teaches lexical overlap as well as abstract relevance; it uses
   * 90% removal — `keepOneIn = 10`).
   *
   * Takes pre-segmented rows (id, segIdx, segText) — compose with any
   * segmenter (fixed token blocks, [[TextTiling]]-style topical
   * chunks, sentence splits). Query choice and keep flag are
   * md5(id)-seeded column arithmetic, so every engine, rerun, and
   * partitioning picks the same pair. ONE hash aggregate per document
   * over `sort_array(collect_list(struct(...)))` — segment counts per
   * doc are bounded (they partition the doc), so the collected list is
   * document-sized, never corpus-sized.
   *
   * Output: (id, n_segments, query_idx, kept_in_context, query_text,
   * context_text) — docs with a single segment emit nothing (their
   * context would be empty supervision).
   */
  def ictPairs(
      segs: DataFrame, idCol: String, segIdxCol: String,
      segTextCol: String, keepOneIn: Int = 10): DataFrame = {
    require(keepOneIn >= 1, s"keepOneIn must be >= 1, got $keepOneIn")
    val perDoc = segs.groupBy(col(idCol).as("__id")).agg(
      count(lit(1)).as("n_segments"),
      sort_array(collect_list(struct(
        col(segIdxCol).cast("long").as("i"),
        col(segTextCol).as("t")))).as("__ss"))
      .filter(col("n_segments") >= 2)
    val qpos = (ictHash(col("__id"), 0) % col("n_segments")).cast("int")
    val keep = ictHash(col("__id"), 1) % keepOneIn === 0
    perDoc
      .withColumn("__q", element_at(col("__ss"), qpos + 1))
      .select(
        col("__id").as(idCol),
        col("n_segments"),
        col("__q.i").as("query_idx"),
        keep.as("kept_in_context"),
        col("__q.t").as("query_text"),
        concat_ws(" ", transform(
          filter(col("__ss"), s =>
            s.getField("i") =!= col("__q.i") || keep),
          s => s.getField("t"))).as("context_text"))
  }
}
