package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based n-gram language model with stupid backoff — the CCNet /
 * "Large Language Models in Machine Translation" (Brants et al., EMNLP
 * 2007) corpus-quality signal, which that paper designed SPECIFICALLY
 * for distributed count-based training: the model IS three count
 * tables, so training is nothing but hash aggregates with map-side
 * partials, and scoring is equality joins — both shapes that survive a
 * 1000-executor 100 TB corpus unchanged. CCNet-style pipelines rank
 * web documents by LM perplexity and keep the low-perplexity (fluent)
 * tail; this operator pair provides exactly that signal.
 *
 * Beyond-reference scope (the reference has no text functions at all,
 * SURVEY.md §2.2).
 *
 * Semantics (deterministic, engine-reproducible):
 *  - Tokens are SQL-`split`-on-single-space fields (empties kept),
 *    matching `string_split(text, ' ')` in the DuckDB oracle.
 *  - One kernel call per document ([[graft.functions.TextHashKernels
 *    .gramWindows]]) yields the per-position trigram windows "c",
 *    "b c", "a b c", …; ONE explode serves unigram, bigram and trigram
 *    counting AND scoring — every backoff key is a codegen'd
 *    `substring_index` of the window, so nothing tokenizes twice.
 *  - Stupid backoff (α = 0.4): S(c|a b) = f(abc)/f(ab) when the
 *    trigram was seen, else 0.4·S(c|b); S(c|b) = f(bc)/f(b) when seen,
 *    else 0.4·S(c); S(c) = f(c)/N, with a 1/N out-of-vocabulary floor
 *    so scoring is total on unseen text. Positions 1 and 2 of each
 *    document start at the deepest AVAILABLE order (no sentence
 *    padding), taking no penalty for context that cannot exist.
 *  - Trigram counts below `minTriCount` are pruned (standard count
 *    pruning; the bigram/unigram tables stay unpruned because they are
 *    also the backoff DENOMINATORS — f(ab) ≥ f(abc) keeps every ratio
 *    well-defined).
 *
 * Scale shape: training = three hash aggregates over the exploded
 * windows (partials map-side; the relation is never wider than
 * (window, count)). In production the three tables are written once
 * and reused across scoring runs — KenLM-style — and count pruning
 * makes the trigram table broadcastable for most corpora; the scoring
 * joins below are plain equality joins, so Catalyst/AQE picks
 * broadcast vs shuffle per table, with skew handling on the zipfian
 * head for free. Scoring collapses per-document repeated windows to a
 * multiplicity first, so the join probe side is the DISTINCT
 * (doc, window) relation, not raw token positions.
 */
object LanguageModel {

  /** Backoff penalty per order skipped (Brants et al. 2007's α). */
  val Alpha = 0.4

  /** Exploded per-position windows: (doc_id, w, nw) where `w` is the
    * last min(i,3) tokens ending at position i and `nw` its order. */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(call_function("gram_windows", col(textCol))).as(Seq("p", "w")))
      .select(col("doc_id"), col("w"), least(col("p") + 1, lit(3)).as("nw"))
  }

  /** ONE corpus pass serving every count table: the distinct-window
    * count relation. Every consumer ([[uniFrom]]/[[biFrom]]/
    * [[triFrom]]) aggregates over this IDENTICAL subtree — same
    * columns consumed, no filter below it — so the exchange
    * canonicalizes once and AQE's ReusedExchange runs the corpus
    * explode a single time at runtime, where the pre-r17 shape (four
    * aggregates keyed differently straight over the positions explode)
    * had four incompatible exchanges and four corpus passes.
    *
    * Two deliberate non-obvious choices keep the subtrees identical:
    *  - NOT localCheckpoint'ed: an eager barrier here was measured
    *    25–30 % SLOWER at sf0.1 (it serializes the materialize, then
    *    the downstream branches, where exchange reuse keeps the
    *    re-aggregations pipelined in one job DAG);
    *  - the order filters live INSIDE the downstream aggregates
    *    (`sum(when(nw…))`) rather than as `.filter` — a filter on the
    *    grouping key pushes below this aggregate and forks the
    *    exchange into per-order variants, killing the reuse.
    * The re-aggregation is exact:
    * Σ_{windows with key g} 1 ≡ Σ_{distinct windows, key g} cnt. */
  private def windowCounts(pos: DataFrame): DataFrame =
    pos.groupBy(col("w"), col("nw"))
      .agg(count(lit(1)).as("cnt"))

  /** Unigram counts over every position's last token. The `nw >= 1`
    * guard is an identity (orders are 1..3) whose purpose is to consume
    * the same column set as [[biFrom]]/[[triFrom]], so column pruning
    * cannot fork the shared [[windowCounts]] exchange. */
  private def uniFrom(cnt: DataFrame): DataFrame =
    cnt.groupBy(substring_index(col("w"), " ", -1).as("g"))
      .agg(sum(when(col("nw") >= 1, col("cnt"))).as("cnt"))

  /** Bigram counts (last two tokens of order-≥2 windows; unpruned —
    * also the trigram backoff denominator). Order-1 windows contain no
    * space, so they can never collide with a real "x y" bigram key:
    * groups whose sum is NULL are exactly the pre-r17 filtered-out
    * ones. */
  private def biFrom(cnt: DataFrame): DataFrame =
    cnt.groupBy(substring_index(col("w"), " ", -2).as("g"))
      .agg(sum(when(col("nw") >= 2, col("cnt"))).as("cnt"))
      .filter(col("cnt").isNotNull)

  /** Trigram counts pruned at `minTriCount` (standard count pruning).
    * Only order-3 windows have 3-token keys, so NULL-sum groups are
    * exactly the lower-order windows the pre-r17 filter dropped. */
  private def triFrom(cnt: DataFrame, minTriCount: Int): DataFrame =
    cnt.groupBy(col("w").as("g"))
      .agg(sum(when(col("nw") === 3, col("cnt"))).as("cnt"))
      .filter(col("cnt").isNotNull && col("cnt") >= minTriCount)

  /** Per-order model summary after pruning: (ord, n_grams, total_occ) —
    * the "model card" of a trained count LM. */
  def modelStats(docs: DataFrame, idCol: String, textCol: String,
      minTriCount: Int = 2): DataFrame = {
    // same one-corpus-pass discipline as [[windowScores]]: the three
    // per-order tables re-aggregate the materialized window counts
    // instead of re-running the positions explode once per order
    val cnt = windowCounts(positions(docs, idCol, textCol))
    val uni = uniFrom(cnt)
    val bi = biFrom(cnt)
    val tri = triFrom(cnt, minTriCount)
    def s(counts: DataFrame, ord: Int): DataFrame =
      counts.agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(col("cnt")), lit(0L)).as("total_occ"))
        .select(lit(ord.toLong).as("ord"), col("n_grams"), col("total_occ"))
    s(uni, 1)
      .unionAll(s(bi, 2))
      .unionAll(s(tri, 3))
      .orderBy("ord")
  }

  /**
   * Per-document stupid-backoff log-probability and perplexity under a
   * trigram model trained on `model` (often the corpus itself — the
   * CCNet arrangement trains on a reference corpus and scores the
   * crawl; both are this one operator with different arguments).
   *
   * Output: (doc_id, n_tokens, logprob, ppl) with logprob = Σ ln S and
   * ppl = exp(−logprob / n_tokens), both rounded to 4 places (the
   * repo-wide float-determinism convention: double-sum reorderings
   * across partitionings land well inside the rounding).
   */
  def docPerplexity(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelIdCol: String, modelTextCol: String,
      minTriCount: Int = 2): DataFrame =
    windowScores(docs, idCol, textCol, model, modelIdCol, modelTextCol,
      minTriCount)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_tokens"),
        sum(col("k").cast("double") * log(col("s"))).as("lp"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("lp"), 4).as("logprob"),
        round(exp(-col("lp") / col("n_tokens").cast("double")), 4).as("ppl"))

  /** Shared probe of [[docPerplexity]] and [[minKProb]]: per distinct
    * (doc, window) the stupid-backoff score `s` and multiplicity `k`.
    * @return (doc_id, w, nw, k, s) */
  def windowScores(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelIdCol: String, modelTextCol: String,
      minTriCount: Int = 2): DataFrame = {
    val pos = positions(docs, idCol, textCol)
    val mpos = positions(model, modelIdCol, modelTextCol)
    // ONE model-corpus pass: the four count relations (uni, bi, tri,
    // total) are all re-aggregations of [[windowCounts]]'s shared
    // per-window counts. Deriving each from `mpos` directly — the
    // pre-r17 shape — re-ran the corpus explode once per table (4
    // passes; the 473-line contamination_min_k plan).
    val mcnt = windowCounts(mpos)
    val uni = uniFrom(mcnt)
    val bi = biFrom(mcnt)
    val tri = triFrom(mcnt, minTriCount)
    // Corpus token mass N stays IN the plan as a 1-row broadcast cross
    // join. Every position lands in exactly one last-token group, so
    // N = Σ uni counts — derived from `uni` (not mcnt directly, whose
    // narrower pruned projection would fork the shared exchange).
    val total = uni.agg(sum("cnt").cast("double").as("n_total"))

    // Collapse repeated windows per document before probing the model:
    // the join side shrinks from |tokens| to |distinct (doc, window)|
    // rows — a large factor on zipfian text — and the per-position
    // ln(s) rides back out as a multiplicity-weighted sum.
    val probe = pos.groupBy(col("doc_id"), col("w"), col("nw"))
      .agg(count(lit(1)).as("k"))
      .withColumn("uni_key", substring_index(col("w"), " ", -1))
      .withColumn("bi_key", when(col("nw") >= 2, substring_index(col("w"), " ", -2)))
      .withColumn("ctx_uni_key", when(col("nw") >= 2, substring_index(col("bi_key"), " ", 1)))
      .withColumn("tri_key", when(col("nw") === 3, col("w")))
      .withColumn("ctx_bi_key", when(col("nw") === 3, substring_index(col("w"), " ", 2)))

    val joined = probe
      .join(tri.select(col("g").as("tri_key"), col("cnt").as("c_tri")),
        Seq("tri_key"), "left")
      .join(bi.select(col("g").as("ctx_bi_key"), col("cnt").as("c_ctx_bi")),
        Seq("ctx_bi_key"), "left")
      .join(bi.select(col("g").as("bi_key"), col("cnt").as("c_bi")),
        Seq("bi_key"), "left")
      .join(uni.select(col("g").as("ctx_uni_key"), col("cnt").as("c_ctx_uni")),
        Seq("ctx_uni_key"), "left")
      .join(uni.select(col("g").as("uni_key"), col("cnt").as("c_uni")),
        Seq("uni_key"), "left")
      .crossJoin(broadcast(total))

    // Denominators coalesce to 1 for totality only: when a kept trigram
    // (bigram) exists its context bigram (unigram) count is ≥ it, so
    // the fallback never fires on a self-trained model.
    val s =
      when(col("c_tri").isNotNull,
        col("c_tri").cast("double") / coalesce(col("c_ctx_bi"), lit(1L)).cast("double"))
      .when(col("c_bi").isNotNull,
        when(col("nw") === 3, lit(Alpha)).otherwise(lit(1.0)) *
          col("c_bi").cast("double") / coalesce(col("c_ctx_uni"), lit(1L)).cast("double"))
      .otherwise(
        when(col("nw") === 3, lit(Alpha * Alpha))
          .when(col("nw") === 2, lit(Alpha)).otherwise(lit(1.0)) *
          coalesce(col("c_uni"), lit(1L)).cast("double") / col("n_total"))

    joined.select(col("doc_id"), col("w"), col("nw"), col("k"),
      s.as("s"))
  }

  /**
   * Min-k%-prob membership inference (Shi et al. 2023, "Detecting
   * Pretraining Data from Large Language Models") — the
   * contamination/memorization detector: a document the model has
   * MEMORIZED has no low-probability outlier tokens, so the mean
   * log-prob of its k% LEAST likely tokens is anomalously high.
   * Scored here under the same count trigram LM as [[docPerplexity]]
   * (the published method is model-agnostic; any per-token log-prob
   * source works).
   *
   * Exactness: each window's log-prob is quantized ONCE to the 6-dp
   * micro grid, selection is an ordered prefix sum over the TOTAL
   * order (lp_micro, window string) with integer take-arithmetic —
   * bit-stable under any partitioning — and only the final mean is
   * one rounded double division. Windows per document are bounded by
   * the document (partitioned window functions only).
   *
   * @return (doc_id, n_tokens, k_tokens, mink_logp_micro_mean) —
   *         HIGHER mean = more memorization-suspicious.
   */
  def minKProb(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelIdCol: String, modelTextCol: String,
      kPct: Int = 20, minTriCount: Int = 2): DataFrame = {
    require(kPct >= 1 && kPct <= 100, s"kPct must be in [1,100], got $kPct")
    import org.apache.spark.sql.expressions.Window
    val scored = windowScores(docs, idCol, textCol, model, modelIdCol,
      modelTextCol, minTriCount)
      .withColumn("lp_micro",
        (round(log10(col("s")), 6).cast("decimal(28,6)") * 1000000)
          .cast("long"))
    val byDoc = Window.partitionBy("doc_id")
    val ordered = Window.partitionBy("doc_id")
      .orderBy(col("lp_micro"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__cum", sum("k").over(ordered))
      .withColumn("__n", sum("k").over(byDoc))
      .withColumn("__m",
        greatest(lit(1L), expr(s"(__n * $kPct) div 100")))
      .withColumn("__take",
        greatest(lit(0L),
          least(col("k"), col("__m") - (col("__cum") - col("k")))))
      .groupBy(col("doc_id"))
      .agg(max("__n").as("n_tokens"), max("__m").as("k_tokens"),
        sum(col("__take") * col("lp_micro")).as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("k_tokens"),
        round(col("__s").cast("double") /
          col("k_tokens").cast("double"), 6).as("mink_logp_micro_mean"))
  }

  /**
   * Good-Turing frequency-of-frequencies card (Good 1953): for each
   * observed token count r, the number of types N_r seen exactly r
   * times and the GT re-estimated count r* = (r+1)·N_{r+1}/N_r — the
   * classical smoothing diagnostic (how much probability mass belongs
   * to unseen events = N_1/N). Exact integers; the re-estimate is a
   * micro-integral division over a DECIMAL product (two counts can
   * overflow a BIGINT product at corpus scale); ranks with no
   * successor frequency emit NULL visibly.
   *
   * Shape: token counts (one hash aggregate), then the
   * frequency-of-frequency aggregate — both map-side combinable; the
   * self-join for N_{r+1} runs on the FoF relation, which is at most
   * √(2·corpus-tokens) rows.
   */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy("term").agg(count(lit(1)).as("r"))
    val fof = freq.groupBy("r").agg(count(lit(1)).as("n_r"))
    val next = fof.select((col("r") - 1).as("r"), col("n_r").as("__n1"))
    fof.join(next, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        when(col("__n1").isNotNull,
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (r + 1) * __n1 " +
            "div (CAST(n_r AS DECIMAL(38,0))) AS BIGINT)"))
          .as("r_star_micro"))
      .orderBy("r")
  }

  /**
   * Interpolated Kneser–Ney bigram card (Kneser & Ney 1995; Chen &
   * Goodman 1998) — the standard n-gram LM smoothing, whose insight is
   * that the backoff weight of a word should be its CONTEXT FERTILITY
   * (how many distinct predecessors it follows), not its raw
   * frequency:
   *
   *   P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
   *               + (D · N1+(w1·)/c(w1·)) · (N1+(·w2)/N1+(··))
   *
   * with discount D = 0.75 (Chen & Goodman's fixed-discount variant;
   * 0.75 is exact in binary, so the arithmetic is reproducible). All
   * five counts are exact integers; the probability is double
   * arithmetic in a FIXED expression order rounded to 6 dp — the
   * package's accepted class. Reported for the top-`topK` bigrams by
   * (count desc, w1, w2).
   *
   * Shape: ONE corpus scan (the shared [[positions]] explode) into a
   * bigram hash aggregate; the context / continuation / total
   * relations all derive from that bigram relation (≤ distinct-bigram
   * rows, zipf-small vs the corpus), and the total is a 1-row
   * broadcast. At 100 TB the only full-data pass is the window scan —
   * the same shape as [[modelStats]].
   */
  def kneserNey(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 30): DataFrame = {
    val pos = positions(docs, idCol, textCol)
    val bi = pos.filter(col("nw") >= 2)
      .select(
        substring_index(substring_index(col("w"), " ", -2), " ", 1).as("w1"),
        substring_index(col("w"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_fwd"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n1p_bwd"))
    val tot = bi.agg(count(lit(1)).as("n_bigram_types"))
    bi.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_fwd"), col("n1p_bwd"), col("n_bigram_types"),
        round(
          greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) /
            col("c1").cast("double") +
            ((lit(0.75) * col("n1p_fwd").cast("double")) /
              col("c1").cast("double")) *
              (col("n1p_bwd").cast("double") /
                col("n_bigram_types").cast("double")), 6).as("p_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Self-scoring convenience: train on `docs`, score `docs`. */
  def selfPerplexity(docs: DataFrame, idCol: String, textCol: String,
      minTriCount: Int = 2): DataFrame =
    docPerplexity(docs, idCol, textCol, docs, idCol, textCol, minTriCount)
}
