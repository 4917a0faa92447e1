package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines —
 * beyond-reference scope (the reference has no in-query string functions
 * at all, SURVEY.md §2.2), built entirely from codegen'd
 * `org.apache.spark.sql.functions` so every metric stays inside
 * WholeStageCodegen: no UDFs, no driver-side loops, one narrow
 * projection over the scan.
 *
 * All operators are per-row (embarrassingly parallel) except
 * [[langStats]], which is a hash aggregate with map-side partial
 * aggregation — both shapes survive a 1000-executor 100 TB scan
 * unchanged.
 */
object TextAnalysis {

  /** Whitespace tokenizer — the shared building block. */
  def tokens(text: Column): Column = split(text, " ")

  /** Tiny per-language marker lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and fixed: the point is a
    * deterministic, cheap, scan-local signal, not a trained model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  /** Stopword list used by the quality score. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and")

  /** Codegen'd kernel counter (`token_hits`) — `filter(toks, _.isin(...))`
    * is a `CodegenFallback` HOF and evaluates interpreted. */
  private def hitCount(text: Column, words: Seq[String]): Column =
    call_function("token_hits", text, typedLit(words))

  /**
   * Per-document statistics: length, token counts, type-token ratio,
   * stopword ratio. Everything derives from one `split` per row.
   */
  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = tokens(col(textCol))
    val nTokens = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("len_chars"),
      nTokens.as("n_tokens"),
      nDistinct.as("n_distinct"),
      round(nDistinct.cast("double") / nTokens, 6).as("ttr"),
      round(hitCount(col(textCol), StopWords).cast("double") / nTokens, 6).as("stopword_ratio"))
  }

  /** Regex token counting (a BPE-ish pre-tokenizer pass): runs of
    * letters, runs of digits, and single non-alphanumeric marks. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0))).cast("long").as("n_alpha"),
      size(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0))).cast("long").as("n_num"),
      size(tokens(col(textCol))).cast("long").as("n_ws"))

  /**
   * Language identification by marker-token counting: score each
   * candidate language by hits of its marker words, pick the argmax with
   * a fixed, deterministic preference order on ties (en > de > fr > es).
   */
  /** Per-language marker hit counts for a text column — the ONE
    * source of the scores every language-id surface shares. */
  private def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> hitCount(text, words) }

  /** The argmax with the FIXED en > de > fr > es tie order — shared
    * by [[languageId]], [[langConfusion]], and [[languageSegments]]
    * so the tie-break can never diverge between surfaces (each has a
    * SQL oracle replaying this exact CASE). */
  private def langPred(scores: Seq[(String, Column)]): Column = {
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val scores = langScores(col(textCol))
    docs.select(
      col(idCol) +:
        scores.map { case (lang, c) => c.as(s"${lang}_hits") } :+
        langPred(scores).as("lang_pred"): _*)
  }

  /**
   * Code-switch segmentation — [[languageId]] applied PER TOKEN BLOCK
   * with consecutive same-language runs collapsed: multilingual web
   * documents routinely switch language mid-page (quoted sources,
   * boilerplate, comment sections), and a document-level label
   * mis-routes every minority span. Segments feed per-language
   * pipelines the way [[TextTiling]] segments feed chunking — same
   * mechanics (block grid, boundary flags, run collapse via one
   * PARTITIONED window), different boundary signal (marker-word
   * argmax with the fixed en>de>fr>es tie order instead of Jaccard
   * cohesion). Integer hits + a deterministic CASE: SQL-replayable.
   */
  def languageSegments(
      docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 8): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .withColumn("n_blocks",
        ceil(size(col("toks")) / lit(blockTokens.toDouble)).cast("int"))
      .filter(col("n_blocks") >= 1)
    val blocks = toks
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), col("n_blocks") - 1)).as("block_idx"))
      .withColumn("block_text", array_join(
        expr(s"slice(toks, block_idx * $blockTokens + 1, $blockTokens)"), " "))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("block_idx")
    blocks
      .withColumn("lang", langPred(langScores(col("block_text"))))
      .withColumn("boundary",
        when(lag(col("lang"), 1).over(w).isNull, 1L)
          .when(lag(col("lang"), 1).over(w) =!= col("lang"), 1L)
          .otherwise(0L))
      .withColumn("seg_id", sum(col("boundary")).over(w) - 1L)
      .groupBy("id", "seg_id")
      .agg(min(col("lang")).as("lang"), // constant within a segment
        min(col("block_idx")).cast("long").as("first_block"),
        count(lit(1)).as("n_blocks"))
  }

  /**
   * Language-ID confusion matrix: the n-gram heuristic's predictions
   * cross-tabulated against the labeled language — the eval card that
   * tells you whether the cheap classifier is good enough to route on
   * (and where it fails: zh has no Latin marker words, so its row
   * lands wherever the tie-break sends zero-hit docs). ONE hash
   * aggregate over the same scan-local hit counters as [[languageId]].
   */
  def langConfusion(docs: DataFrame, langCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pred = langPred(langScores(col(textCol)))
    docs.groupBy(col(langCol).as("lang_true"), pred.as("lang_pred"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Wilson-score lower confidence bound on a per-source "good
   * document" rate — the release gate's statistically honest form: a
   * source with 3/3 good docs must NOT outrank one with 960/1000, and
   * the plain ratio says it does. The bound derives per source from
   * TWO integers (n, k) through one fixed double expression (z=1.96),
   * so distributed evaluation cannot perturb it; `good` is any
   * row-local boolean column.
   */
  def sourceWilson(
      docs: DataFrame, srcCol: String, good: Column): DataFrame = {
    val agg = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(good, 1L).otherwise(0L)).as("k"))
    val nd = col("n").cast("double")
    val p = col("k").cast("double") / nd
    val z = lit(1.96)
    val lower =
      (p + z * z / (lit(2.0) * nd) -
        z * sqrt(p * (lit(1.0) - p) / nd + z * z / (lit(4.0) * nd * nd))) /
        (lit(1.0) + z * z / nd)
    agg.select(col("source"), col("n"), col("k"),
      p.as("p_hat"), lower.as("wilson_lower"))
  }

  /** Per-language corpus statistics — hash aggregate, partials map-side. */
  def langStats(docs: DataFrame, langCol: String, textCol: String): DataFrame =
    docs.groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol)))).as("total_tokens"),
        round(avg(length(col(textCol))), 4).as("avg_chars"))

  /**
   * TF-IDF top terms per document: tf(t,d) · ln(N / df(t)), keeping the
   * `topK` highest-scoring terms per doc (term tie-break).
   *
   * Shape at scale: explode ONCE → one hash aggregate to term
   * frequency per (doc, term) → document frequency as a hash AGGREGATE
   * over that slim relation (one row per (doc, term), so count(*) per
   * term IS df; map-side partials keep ubiquitous terms — "the" is in
   * every document — off any single reducer, where a `count() OVER
   * (PARTITION BY term)` window would pin a whole stop-word's rows to
   * one un-splittable window partition) → the vocabulary-sized df
   * relation broadcasts back → a per-doc top-k window. The frequency
   * branch consumes the per-(doc, term) aggregate INCLUDING its count
   * column (the instance-sum conjunct below is redundant but prevents
   * the distinct-style pruning rewrite), keeping its exchange
   * canonically identical to the probe's so ReuseExchange runs the
   * explode once — verified on the final adaptive plan.
   */
  def tfIdfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Corpus size N stays IN the plan as a broadcast one-row cross join —
    // a driver-side docs.count() here would force a second full pass over
    // the corpus at plan-build time, once per invocation.
    val nDf = docs.agg(count(lit(1)).cast("double").as("__graft_n"))
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // sum(tf) ≥ count(*) always — the conjunct only keeps `tf` consumed
    // so the shared exchange stays reusable (see scaladoc).
    val df = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("__inst"))
      .filter(col("__inst") >= col("df"))
      .select(col("term"), col("df"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        round(col("tf") * log(col("__graft_n") / col("df")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }

  /**
   * Composite document quality score in the style of public LLM-corpus
   * filters (Gopher/C4 rules): per-document metrics plus a score in
   * [0, 1] = the fraction of passed checks. Thresholds are parameters so
   * pipelines can tune per corpus; everything is one codegen'd
   * projection per row — the cheapest possible full-corpus pass, which
   * is what a pre-training filter must be at 100 TB.
   *
   * Checks: token count within [minTokens, maxTokens]; mean word length
   * within [3, 10]; stopword ratio ≥ minStopRatio (gibberish has none);
   * punctuation ratio ≤ maxPunctRatio (markup/boilerplate has lots).
   */
  def qualityScore(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 20L, maxTokens: Long = 100000L,
      minStopRatio: Double = 0.01, maxPunctRatio: Double = 0.2): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val (nTokens, meanWordLen, stopRatio, punctRatio, passed, nChecks) =
      qualityParts(col(textCol), minTokens, maxTokens, minStopRatio,
        maxPunctRatio)
    docs.select(
      col(idCol),
      nTokens.as("n_tokens"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      passed.cast("long").as("checks_passed"),
      round(passed.cast("double") / nChecks, 6).as("quality"))
  }

  /** The quality-gate expression as a single Column — the scan-local
    * form [[CurationPipeline]] attaches to the corpus row directly (a
    * join back by id would shuffle the whole corpus to re-attach a
    * per-row projection). Bit-identical to [[qualityScore]]'s
    * `quality` column by construction (both build from
    * [[qualityParts]]). */
  def qualityColumn(
      text: Column,
      minTokens: Long = 20L, maxTokens: Long = 100000L,
      minStopRatio: Double = 0.01, maxPunctRatio: Double = 0.2): Column = {
    val (_, _, _, _, passed, nChecks) =
      qualityParts(text, minTokens, maxTokens, minStopRatio, maxPunctRatio)
    round(passed.cast("double") / nChecks, 6)
  }

  /** Shared metric expressions of [[qualityScore]]/[[qualityColumn]]:
    * (nTokens, meanWordLen, stopRatio, punctRatio, passed, nChecks). */
  private def qualityParts(
      text: Column, minTokens: Long, maxTokens: Long,
      minStopRatio: Double, maxPunctRatio: Double)
      : (Column, Column, Column, Column, Column, Int) = {
    val toks = tokens(text)
    val nTokens = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9 ]"), lit(0))).cast("long")
    val meanWordLen = (nChars - (nTokens - lit(1L))).cast("double") / nTokens
    val stopRatio = hitCount(text, StopWords).cast("double") / nTokens
    // empty text guard: 0/0 would be NULL and poison every check below
    val punctRatio = when(nChars === 0L, 0.0).otherwise(nPunct.cast("double") / nChars)
    val checks = Seq(
      nTokens >= minTokens && nTokens <= maxTokens,
      meanWordLen >= 3.0 && meanWordLen <= 10.0,
      stopRatio >= minStopRatio,
      punctRatio <= maxPunctRatio)
    val passed = checks.map(c => when(c, 1).otherwise(0)).reduce(_ + _)
    (nTokens, meanWordLen, stopRatio, punctRatio, passed, checks.length)
  }

  /**
   * Frequency-based document scoring: the mean log10 corpus frequency
   * of a document's tokens. Documents dominated by corpus-rare tokens
   * (OCR noise, gibberish, foreign-script leakage) score low; common
   * fluent text scores high — the standard Zipf-frequency quality
   * signal next to [[qualityScore]]'s rule checks.
   *
   * Shape at scale: explode ONCE → one shuffle to per-(doc, term)
   * counts → corpus-wide term counts derive from that relation as
   * `sum(dtf)` per term (vocabulary-sized — the broadcast side; and
   * because this branch consumes the SAME aggregate including its
   * count column, its exchange is canonically identical to the probe
   * branch's and ReuseExchange computes the explode pass once —
   * verified on the final adaptive plan) → an equality join probed by
   * the per-(doc, term) relation, not by every token instance (a doc
   * mentioning "the" 500 times probes once with weight 500) → one
   * per-doc aggregate. Determinism: each token's
   * log10(tf) is rounded to `scale` decimals, then weighted and summed
   * EXACTLY in DECIMAL (decimal × integer is exact), so partition/merge
   * order cannot perturb the score; one final double division + round.
   */
  def tokenLogFreqScore(
      docs: DataFrame, idCol: String, textCol: String, scale: Int = 6): DataFrame = {
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val dtf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("dtf"))
    val freq = dtf.groupBy("term").agg(sum(col("dtf")).as("tf"))
    dtf.join(broadcast(freq), "term")
      .groupBy(idCol)
      .agg(
        sum(col("dtf")).as("n_tokens"),
        sum(round(log10(col("tf")), scale).cast("decimal(28,6)") * col("dtf"))
          .as("__logsum"))
      .select(col(idCol), col("n_tokens"),
        round(col("__logsum").cast("double") / col("n_tokens"), scale)
          .as("logfreq_score"))
  }

  /**
   * CCNet-style calibrated score bucketing: each document is bucketed
   * by where its [[tokenLogFreqScore]] falls within ITS STRATUM's
   * score distribution (CCNet buckets by per-language perplexity
   * terciles — head/middle/tail; this is the same gate with the Zipf
   * log-frequency proxy). The thresholds come from the corpus itself,
   * so the filter adapts per stratum instead of applying one global
   * constant to languages with different score ranges.
   *
   * Shape at scale: the single-explode [[tokenLogFreqScore]] pass with
   * the stratum threaded through its shuffle keys → per-stratum
   * threshold aggregate (|strata| rows — the broadcast side) → one
   * broadcast join + a codegen'd when-chain per row. With
   * `exactThresholds = true` the cut points are Spark's exact
   * `percentile` (sort-per-group; bounded-cardinality strata only —
   * the driver-oracle path); `false` uses `percentile_approx`
   * (t-digest with map-side partials, the unbounded 100 TB path —
   * same contract as `events_quantiles` vs `events_quantiles_approx`).
   * Buckets, not thresholds, are the output: bucket membership is
   * stable under last-ulp interpolation differences between engines,
   * raw interpolated thresholds are not.
   */
  def logFreqBuckets(
      docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
      cuts: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      exactThresholds: Boolean = true,
      scale: Int = 6): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.forall(c => c > 0 && c < 1),
      s"cuts must be sorted fractions in (0, 1): $cuts")
    // Null strata cannot be bucketed (the threshold join drops them) —
    // filtering them HERE, before the branches diverge, also keeps the
    // scored subtree canonically identical on both sides of that join:
    // otherwise the join pushes isnotnull(stratum) into the probe branch
    // only, the exchanges stop matching, and ReuseExchange silently
    // re-runs the explode pass (verified on the final adaptive plan).
    val terms = docs.filter(col(stratumCol).isNotNull)
      .select(col(idCol), col(stratumCol), explode(tokens(col(textCol))).as("term"))
    val dtf = terms.groupBy(col(idCol), col(stratumCol), col("term"))
      .agg(count(lit(1)).as("dtf"))
    val freq = dtf.groupBy("term").agg(sum(col("dtf")).as("tf"))
    val scored = dtf.join(broadcast(freq), "term")
      .groupBy(col(idCol), col(stratumCol))
      .agg(
        sum(col("dtf")).as("n_tokens"),
        sum(round(log10(col("tf")), scale).cast("decimal(28,6)") * col("dtf"))
          .as("__logsum"))
      .select(col(idCol), col(stratumCol),
        round(col("__logsum").cast("double") / col("n_tokens"), scale)
          .as("logfreq_score"))
    val pcts = array(cuts.map(lit): _*)
    val thr = scored.groupBy(col(stratumCol))
      .agg((if (exactThresholds) percentile(col("logfreq_score"), pcts)
            else percentile_approx(col("logfreq_score"), pcts, lit(10000)))
        .as("__thr"))
    val bucket = cuts.indices.foldRight(lit(cuts.length.toLong)) { (i, rest) =>
      when(col("logfreq_score") < element_at(col("__thr"), i + 1), i.toLong)
        .otherwise(rest)
    }
    scored.join(broadcast(thr), Seq(stratumCol))
      .select(col(idCol), col(stratumCol), col("logfreq_score"),
        bucket.cast("long").as("bucket"))
  }

  /**
   * Intra-document repetition metrics — the Gopher-style repetition
   * filter family, complementing [[qualityScore]]'s rule checks:
   * machine-generated and boilerplate text repeats itself WITHIN a
   * document long before it duplicates another document.
   *
   *  - `dup_3gram_ratio`: fraction of token 3-grams that are repeats of
   *    an earlier 3-gram in the same document,
   *  - `dup_token_ratio`: fraction of tokens that are repeats,
   *  - `max_token_ratio`: share of the single most frequent token
   *    (a loop emitting the same word pins this near 1).
   *
   * 100 TB shape: ONE codegen'd kernel call per row
   * (`repetition_counts`, [[graft.functions.TextHashKernels
   * .repetitionCounts]]) feeding a handful of arithmetic columns —
   * inside the scan stage, no explode, no shuffle, no state. The
   * counts are deliberately NOT built from Spark's array higher-order
   * functions: those are `CodegenFallback`, and the interpreted
   * lambda trees re-evaluated per output column were 20× slower for
   * identical semantics (measured at sf0.1).
   */
  def repetitionStats(
      docs: DataFrame, idCol: String, textCol: String, scale: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val c = call_function("repetition_counts", col(textCol))
    val n = element_at(c, 1)
    val nSh = element_at(c, 2)
    val nShDistinct = element_at(c, 3)
    val nDistinct = element_at(c, 4)
    val maxMult = element_at(c, 5)
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      nSh.as("n_shingles"),
      when(nSh === 0L, 0.0)
        .otherwise(round(lit(1.0) - nShDistinct.cast("double") / nSh, scale))
        .as("dup_3gram_ratio"),
      when(n === 0L, 0.0)
        .otherwise(round(lit(1.0) - nDistinct.cast("double") / n, scale))
        .as("dup_token_ratio"),
      when(n === 0L, 0.0)
        .otherwise(round(maxMult.cast("double") / n, scale))
        .as("max_token_ratio"))
  }

  /**
   * Sliding-window token chunking — the standard pre-embedding step
   * (a 64-dim encoder reads ~chunk-sized inputs, not whole documents).
   * Emits one row per (document, window): windows of `chunkTokens`
   * tokens starting every `stride` tokens; the last window is the
   * first one reaching the end of the document (no redundant suffix
   * windows), and a document shorter than one window yields exactly
   * one chunk.
   *
   * 100 TB shape: per-row generate + explode inside the scan stage —
   * fan-out is bounded by ~n_tokens/stride per row, no shuffle, no
   * state; chunk ids are deterministic (doc id × window index).
   */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1, s"chunkSize/stride must be >= 1")
    val toks = tokens(col(textCol))
    val n = size(toks)
    // first start s.t. start + chunkSize >= n  ⇒  nStarts = ceil((n-chunkSize)/stride)+1
    val nStarts = when(n <= chunkSize, lit(1))
      .otherwise(floor((n - chunkSize + stride - 1).cast("double") / stride).cast("int") + 1)
    docs
      .select(col(idCol), toks.as("__toks"),
        posexplode(sequence(lit(0), nStarts - 1)).as(Seq("__k", "__start")))
      .select(
        col(idCol),
        col("__k").cast("long").as("chunk_id"),
        size(slice(col("__toks"), col("__k") * stride + 1, lit(chunkSize))).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__k") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /**
   * Vocabulary coverage / OOV analysis — the tokenizer-prep question:
   * with a vocabulary of the corpus's `vocabSize` most frequent tokens
   * (count DESC, token ASC tie-break, so the cut is deterministic),
   * what fraction of each document's token instances fall outside it?
   *
   * Shape at scale: explode ONCE → per-(doc, term) counts (one
   * shuffle) → corpus term counts as `sum(dtf)` per term over that
   * relation (vocabulary-sized, map-side partials; consuming the same
   * aggregate WITH its count column keeps the exchange canonically
   * identical to the probe branch's, so ReuseExchange runs the explode
   * pass once) → the top-`vocabSize` cut is a `TakeOrderedAndProject`
   * over the vocabulary-sized relation → broadcast the vocab to the
   * per-doc probe (never shuffles the corpus again) → one per-doc
   * aggregate.
   */
  def vocabCoverage(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, scale: Int = 6): DataFrame = {
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val dtf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("dtf"))
    val vocab = dtf.groupBy("term").agg(sum(col("dtf")).as("tf"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("__in_vocab"))
    dtf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(idCol)
      .agg(
        sum(col("dtf")).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, col("dtf")).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), scale).as("oov_ratio"))
  }

  /**
   * Flesch readability card — the classic surface-statistics quality
   * signal (alongside the Gopher/C4 rules in [[qualityScore]]):
   * reading-ease and grade-level per document from three integer
   * counts. Sentences = runs of terminal punctuation, words = letter
   * runs, syllables = vowel-group runs (the standard regex
   * approximation; a no-vowel token contributes 0 — documented
   * deviation from per-word max(1,·), which would need a per-word
   * explode for no curation benefit). All three are codegen'd
   * `regexp_count`s in ONE scan-local projection — no shuffle, no UDF;
   * the float scores derive from the integers per row, so distributed
   * evaluation order cannot perturb them.
   */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nSent = greatest(lit(1L),
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    val nWords = greatest(lit(1L),
      regexp_count(col(textCol), lit("[A-Za-z]+")).cast("long"))
    val nSyll = regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    val wps = nWords.cast("double") / nSent.cast("double")
    val spw = nSyll.cast("double") / nWords.cast("double")
    docs.select(
      col(idCol),
      nSent.as("n_sentences"),
      nWords.as("n_words"),
      nSyll.as("n_syllables"),
      wps.as("words_per_sentence"),
      spw.as("syllables_per_word"),
      (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("flesch"),
      (lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("fk_grade"))
  }

  /**
   * Corpus datacard: the one-row summary a dataset release ships with —
   * document/token volumes, language/source diversity, and the
   * exact-duplicate surplus (docs minus distinct canonical texts).
   * One scan with map-side partial aggregation; the multi-distinct
   * aggregate expands to Spark's standard Expand plan, each distinct
   * key hashed with partials (no sort, no collect). At 100 TB this is
   * the cheapest full-corpus audit that still answers "how big, how
   * diverse, how redundant".
   */
  def corpusDatacard(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val nTokens = size(tokens(col(textCol))).cast("long")
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(fingerprint(col(textCol))).as("n_distinct_texts"),
      (count(lit(1)) - countDistinct(fingerprint(col(textCol)))).as("exact_dup_docs"),
      sum(nTokens).as("total_tokens"),
      round(avg(nTokens), 4).as("avg_tokens"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"))
  }

  /**
   * Per-source quality scorecard — the release dashboard a curation
   * run ships with: for every source, volumes (docs / tokens), the
   * [[qualityScore]] full-pass rate, and the exact-duplicate surplus.
   * The per-doc pieces are the same expressions the quality gate and
   * dedup key use, so the scorecard is guaranteed consistent with what
   * the pipeline would actually filter.
   *
   * One scan → one hash aggregate keyed on the source (map-side
   * partials; the multi-distinct fingerprint count expands to the
   * standard Expand plan). Ratios are single divisions of exact
   * integer aggregates rounded at the end — engine-reproducible.
   */
  def sourceScorecard(
      docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
      minTokens: Long = 20L, maxTokens: Long = 100000L,
      minStopRatio: Double = 0.01, maxPunctRatio: Double = 0.2): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = tokens(col(textCol))
    val nTokens = size(toks).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val nPunct = size(regexp_extract_all(col(textCol),
      lit("[^a-zA-Z0-9 ]"), lit(0))).cast("long")
    val meanWordLen = (nChars - (nTokens - lit(1L))).cast("double") / nTokens
    val stopRatio = hitCount(col(textCol), StopWords).cast("double") / nTokens
    val punctRatio = when(nChars === 0L, 0.0)
      .otherwise(nPunct.cast("double") / nChars)
    val pass = nTokens >= minTokens && nTokens <= maxTokens &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      stopRatio >= minStopRatio && punctRatio <= maxPunctRatio
    docs.select(col(stratumCol),
        nTokens.as("__graft_t"),
        when(pass, 1L).otherwise(0L).as("__graft_p"),
        fingerprint(col(textCol)).as("__graft_fp"))
      .groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__graft_t").cast("long").as("total_tokens"),
        round(avg("__graft_t"), 4).as("mean_tokens"),
        sum("__graft_p").cast("long").as("pass_docs"),
        countDistinct(col("__graft_fp")).as("__graft_d"))
      .select(col(stratumCol), col("n_docs"), col("total_tokens"),
        col("mean_tokens"), col("pass_docs"),
        round(col("pass_docs") / col("n_docs"), 4).as("pass_rate"),
        (col("n_docs") - col("__graft_d")).as("dup_docs"))
  }

  /**
   * Corpus snapshot diff — the "what changed in v2" release table:
   * canonical-text fingerprints are classified added (new only),
   * removed (old only), or retained (both), with distinct-text and
   * document counts per class (documents counted on the surviving
   * side). Content-based, so re-ingested rows with new ids but
   * identical text are RETAINED, not added+removed — the question a
   * release note actually answers.
   *
   * Shape at scale: one fingerprint hash-aggregate per snapshot
   * (map-side partials) → a fingerprint-keyed full outer join →
   * a 3-row class rollup. No text ever shuffles — only 32-hex
   * fingerprints.
   */
  def corpusDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      textCol: String): DataFrame = {
    def side(df: DataFrame, as: String) =
      df.select(fingerprint(col(textCol)).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as(as))
    side(oldDocs, "__graft_old")
      .join(side(newDocs, "__graft_new"), Seq("fp"), "full_outer")
      .select(
        when(col("__graft_old").isNull, "added")
          .when(col("__graft_new").isNull, "removed")
          .otherwise("retained").as("status"),
        coalesce(col("__graft_new"), col("__graft_old")).as("__graft_docs"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_texts"),
        sum("__graft_docs").cast("long").as("n_docs"))
  }

  /** Document fingerprint: canonicalize (lowercase) then MD5 — the exact
    * dedup key. MD5 is standard across engines, so it doubles as a
    * cross-engine-verifiable fingerprint. */
  def fingerprint(text: Column): Column = md5(lower(text).cast("binary"))

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))

  /**
   * Corpus diversity card: per n ∈ `ns`, total within-document token
   * n-grams, distinct n-grams, and the distinct ratio (n=1 is the
   * classic type-token ratio; falling distinct-2/3 ratios are the
   * standard signal of template spam or synthetic-data mode collapse).
   *
   * Shape: one `transform`+`explode` per n off the shared token split
   * (scan-local, codegen), then ONE aggregate; grams shuffle as 32-hex
   * MD5 fingerprints, never the raw strings, so key width is bounded
   * regardless of n. Exact distinct is the oracle contract at test
   * scale; at 100 TB the same plan swaps `count(distinct)` for an HLL
   * sketch (`approx_count_distinct`) — engine-defined, so pinned
   * against this exact operator in the spec rather than the driver
   * oracle.
   */
  def ngramDiversity(
      docs: DataFrame, textCol: String, ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"n must be positive: $ns")
    val toksDf = docs.select(
      filter(tokens(col(textCol)), t => t =!= "").as("toks"))
    ns.map { n =>
      // guard short docs explicitly: Spark's sequence(1, 0) counts DOWN
      // ([1, 0]), it is not empty like DuckDB's generate_series(1, 0)
      val grams = when(size(col("toks")) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
      toksDf.select(explode(grams).as("gram"))
        .select(md5(col("gram").cast("binary")).as("fp"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("fp")).as("distinct_ngrams"))
        .select(lit(n).cast("long").as("n"),
          col("total_ngrams"), col("distinct_ngrams"),
          round(col("distinct_ngrams") * 1.0 / col("total_ngrams"), 6)
            .as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }

  /**
   * Distribution-drift card between two corpus snapshots: Pearson
   * chi-square contributions over token-count buckets — the standard
   * "did the new crawl/encoder change the data?" gate a training
   * pipeline runs before mixing a refreshed source in. Per bucket b:
   * expected e_b = n_old_b · (N_new/N_old), contribution
   * (n_new_b − e_b)²/e_b (rounded @6; a bucket unseen in the old
   * snapshot has no expectation — contribution is null and the bucket
   * row itself is the signal). Everything derives from two integer
   * count aggregates and one broadcast totals row; the double
   * expression is written identically on both engines, so the card is
   * oracle-exact.
   */
  def bucketDrift(
      oldDocs: DataFrame, newDocs: DataFrame, textCol: String,
      bucketWidth: Int = 10, maxBucket: Int = 20): DataFrame = {
    require(bucketWidth > 0 && maxBucket > 0, "bucketWidth/maxBucket must be positive")
    def buckets(df: DataFrame, as: String) = df
      .select(least(
          floor(size(tokens(col(textCol))).cast("double") / bucketWidth),
          lit(maxBucket.toDouble)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
    val o = buckets(oldDocs, "n_old")
    val n = buckets(newDocs, "n_new")
    val joined = o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(
      sum(col("n_old")).as("__to"), sum(col("n_new")).as("__tn"))
    val e = col("n_old") * (col("__tn").cast("double") / col("__to"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_old"), col("n_new"),
        when(col("n_old") > 0,
          round((col("n_new") - e) * (col("n_new") - e) / e, 6)).as("contrib"))
  }

  /** The 100 TB diversity card: same plan with an HLL sketch
    * (`approx_count_distinct`, mergeable map-side partials, bounded
    * error) in place of the exact distinct — a billion-row exact
    * distinct shuffles every unique gram once, the sketch ships a few
    * KB per partition. Sketch results are engine-defined, so this is
    * pinned against [[ngramDiversity]] in the spec, not the oracle. */
  def ngramDiversityApprox(
      docs: DataFrame, textCol: String, ns: Seq[Int] = Seq(1, 2, 3),
      rsd: Double = 0.05): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"n must be positive: $ns")
    val toksDf = docs.select(
      filter(tokens(col(textCol)), t => t =!= "").as("toks"))
    ns.map { n =>
      val grams = when(size(col("toks")) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
      toksDf.select(explode(grams).as("gram"))
        .select(md5(col("gram").cast("binary")).as("fp"))
        .agg(count(lit(1)).as("total_ngrams"),
          approx_count_distinct(col("fp"), rsd).as("distinct_ngrams"))
        .select(lit(n).cast("long").as("n"),
          col("total_ngrams"), col("distinct_ngrams"),
          round(col("distinct_ngrams") * 1.0 / col("total_ngrams"), 6)
            .as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }

  /**
   * Unicode script-mix card — the multilingual curation signal the
   * lang-ID router needs as a prior and a sanity check: per document,
   * counts of characters in the major script blocks (Latin, Cyrillic,
   * Greek, CJK unified ideographs, Arabic, Devanagari) plus digits,
   * as codegen `regexp_count` integers over EXPLICIT BMP ranges — no
   * `\\p{Script=...}` classes, whose availability and semantics
   * differ across regex engines (Java supports them, RE2 partially) —
   * and the dominant script by count with a fixed tie order. One
   * scan-local projection, no shuffle, no UDF.
   */
  def scriptMix(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scripts = Seq(
      "latin" -> "[A-Za-z]",
      "cyrillic" -> "[\u0400-\u04FF]",
      "greek" -> "[\u0370-\u03FF]",
      "cjk" -> "[\u4E00-\u9FFF]",
      "arabic" -> "[\u0600-\u06FF]",
      "devanagari" -> "[\u0900-\u097F]",
      "digit" -> "[0-9]")
    val counted = scripts.foldLeft(docs.select(col(idCol), t.as("__t"))) {
      case (df, (name, cls)) =>
        df.withColumn(s"n_$name",
          regexp_count(col("__t"), lit(cls)).cast("long"))
    }
    // dominant: max count wins, ties resolve in the declared order
    val dominant = scripts.init.reverse.foldLeft(
      lit(scripts.last._1): Column) { case (rest, (name, _)) =>
      when(scripts.filter(_._1 != name).map(o =>
          col(s"n_$name") >= col(s"n_${o._1}")).reduce(_ && _) &&
          col(s"n_$name") > 0, name).otherwise(rest)
    }
    counted
      .withColumn("dominant",
        when(scripts.map(sc => col(s"n_${sc._1}")).reduce(_ + _) === 0,
          lit("none")).otherwise(dominant))
      .drop("__t")
  }

  /**
   * Collocation mining by pointwise-mutual-information LIFT: for
   * adjacent token pairs with corpus count >= `minCount`, score
   * lift = P(a,b) / (P(a)·P(b)) = c_ab·N² / (B·c_a·c_b) — the
   * monotone transform of PMI (log of it), kept in EXACT micro-integer
   * arithmetic instead of a cross-engine log. Top-k by lift (ties:
   * term pair asc) surfaces multi-word expressions ("new york",
   * "machine learning") for tokenizer vocab seeding and boilerplate
   * phrase discovery.
   *
   * Shape at 100 TB: bigrams and unigrams reduce scan-locally to
   * count relations (vocab-sized, hash-aggregated with map-side
   * partials); totals are a 1-row broadcast; the lift join is
   * vocab×1 hash joins; the final top-k is TakeOrderedAndProject.
   * The lift product runs in DECIMAL(38,0) integral division — exact
   * up to ~10¹⁵ total tokens (beyond that, move to the log domain;
   * the ranking is the same).
   *
   * Output: (term_a, term_b, n_ab, n_a, n_b, lift_micro, rnk).
   */
  def collocations(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k > 0, s"k must be positive, got $k")
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    // zip the array with its own 1-shift (greatest() keeps the slice
    // length non-negative for empty/1-token docs — sequence(1, 0)
    // would REVERSE and index 0)
    val nm1 = greatest(size(toks) - 1, lit(0))
    val pairs = docs.select(explode(
      zip_with(slice(toks, lit(1), nm1), slice(toks, lit(2), nm1),
        (x, y) => struct(x.as("term_a"), y.as("term_b")))).as("p"))
      .select(col("p.term_a"), col("p.term_b"))
    val uni = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val big = pairs.groupBy("term_a", "term_b").agg(count(lit(1)).as("n_ab"))
    val totals = uni.agg(sum("cnt").as("__n"))
      .crossJoin(big.agg(sum("n_ab").as("__b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Retrieval.singlePartitionKey(col("term_a")))
      .orderBy(col("lift_micro").desc, col("term_a"), col("term_b"))
    big.filter(col("n_ab") >= minCount)
      .join(uni.select(col("term").as("term_a"), col("cnt").as("n_a")), "term_a")
      .join(uni.select(col("term").as("term_b"), col("cnt").as("n_b")), "term_b")
      .crossJoin(broadcast(totals))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        expr("(CAST(n_ab AS DECIMAL(38,0)) * __n * __n * 1000000) div " +
          "(CAST(__b AS DECIMAL(38,0)) * n_a * n_b)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("term_a"), col("term_b"))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Corpus n-gram saturation curve — the "is more data still new
   * data" signal that drives collect-more vs dedup-harder decisions
   * (the Chinchilla-era question asked of the corpus itself): the
   * corpus is split into `buckets` equal doc-id ranges (arrival
   * order), and for each bucket the card reports how many distinct
   * n-grams it contains, how many are NEW (first bucket of
   * occurrence), the cumulative distinct total, and the novelty rate
   * on the micro grid. A healthy growing corpus keeps novelty high;
   * a crawl that started recrawling itself decays toward 0.
   *
   * Grams shuffle as md5 fingerprints (bounded key width at any n,
   * the corpus_diversity convention); per-(bucket, gram) distinctness
   * collapses scan-locally before the two slim aggregates; the
   * 10-row cumulative window is constant-size. All counts exact.
   */
  def saturationCurve(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, buckets: Int = 10): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    // n-grams by zip_with-folding n shifted slices (greatest() keeps
    // the slice length non-negative for short docs — sequence(1, 0)
    // would REVERSE, the collocations lesson)
    val nm = greatest(size(toks) - (n - 1), lit(0))
    val gramTexts = (1 until n).foldLeft(slice(toks, lit(1), nm)) {
      (acc, off) =>
        zip_with(acc, slice(toks, lit(1 + off), nm),
          (a, b) => concat(a, lit(" "), b))
    }
    val grams = docs
      .crossJoin(broadcast(docs.agg(max(col(idCol)).as("__mx"))))
      .select(
        expr(s"($idCol * $buckets) div (__mx + 1)").as("b"),
        explode(transform(gramTexts, g => md5(g.cast("binary")))).as("g"))
    val perBucket = grams.groupBy("b", "g").agg(count(lit(1)).as("__c"))
    val inBucket = perBucket.groupBy("b")
      .agg(count(lit(1)).as("n_grams"))
    val firstSeen = perBucket.groupBy("g").agg(min("b").as("b"))
      .groupBy("b").agg(count(lit(1)).as("new_grams"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Retrieval.singlePartitionKey(col("bucket")))
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    inBucket.join(firstSeen, Seq("b"), "left")
      .select(col("b").as("bucket"), col("n_grams"),
        coalesce(col("new_grams"), lit(0L)).as("new_grams"))
      .withColumn("cum_new", sum("new_grams").over(w))
      .withColumn("novelty_micro",
        expr("(CAST(new_grams AS DECIMAL(38,0)) * 1000000) div n_grams"))
  }

  /**
   * Term burstiness (Church & Gale 1995): the variance-to-mean ratio
   * of a term's per-document counts, zeros included — function words
   * spread evenly (VMR near 0 here, since their count barely varies),
   * content words CLUMP (one doc mentions "tokenizer" twelve times,
   * most never). The keyword/topicality signal IDF approximates;
   * exact form: with per-doc counts x over N docs,
   * `vmr_micro = 10⁶·(N·Σx² − (Σx)²) div (N·Σx)` — integer-exact
   * because the all-zero docs contribute nothing to either sum.
   *
   * Shape: one explode → (term, doc) count aggregate (map-side
   * combined), one per-term moment aggregate, top-k by collection
   * frequency via TakeOrderedAndProject. The corpus-size N rides a
   * 1-row broadcast.
   */
  def termBurstiness(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dec = "DECIMAL(38,0)"
    val perDoc = docs
      .select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "__id").agg(count(lit(1)).as("__x"))
    val n = docs.agg(count(lit(1)).as("__n"))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("__x").as("cf"),
        sum(expr(s"CAST(__x AS $dec) * __x")).as("__sx2"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("df").cast("long").as("df"),
        col("cf").cast("long").as("cf"),
        expr(s"(1000000 * (__n * __sx2 - CAST(cf AS $dec) * cf)) div " +
          s"(__n * CAST(cf AS $dec))").as("vmr_micro"))
      .orderBy(col("cf").desc, col("term"))
      .limit(k)
  }

  /**
   * Per-group hapax legomena rate — the vocabulary-richness /
   * boilerplate detector: natural prose keeps ~40–60% of its types
   * as one-offs (Zipf's tail); template-generated or heavily
   * duplicated text collapses the rate toward 0, and OCR noise or
   * mojibake inflates it toward 1. One (group, term) aggregate, one
   * per-group rollup.
   */
  /**
   * Per-group lexical concentration: Yule's characteristic K
   * (Yule 1944, `10⁴·(Σc² − N)/N²` — repeat-rate of the vocabulary,
   * stable under corpus growth, the classic authorship/genre
   * constant) and the unbiased Simpson repeat probability
   * `Σc(c−1)/(N(N−1))` — the chance two sampled tokens are the same
   * type. High values = template/boilerplate-heavy text; the inverse
   * signal of [[hapaxRate]], from the same (group, term) relation.
   * Integer-exact: `yule_k_milli = (10⁷·(S2 − N)) div N²`,
   * `simpson_micro = (10⁶·Σc(c−1)) div (N(N−1))`, DECIMAL(38,0)
   * sums. Groups with N ≤ 1 report 0.
   */
  def lexicalConcentration(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val perTerm = docs
      .select(col(groupCol).as("__g"),
        explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("__g", "term").agg(count(lit(1)).as("__c"))
    perTerm.groupBy("__g")
      .agg(count(lit(1)).as("n_types"),
        sum("__c").as("__n"),
        sum(expr(s"CAST(__c AS $dec) * __c")).as("__s2"),
        sum(expr(s"CAST(__c AS $dec) * (__c - 1)")).as("__rep"))
      .select(col("__g").as(groupCol),
        col("n_types").cast("long").as("n_types"),
        col("__n").cast("long").as("n_tokens"),
        when(col("__n") > 1,
          expr(s"(10000000 * (__s2 - __n)) div (CAST(__n AS $dec) * __n)"))
          .otherwise(0L).as("yule_k_milli"),
        when(col("__n") > 1,
          expr(s"(1000000 * __rep) div (CAST(__n AS $dec) * (__n - 1))"))
          .otherwise(0L).as("simpson_micro"))
  }

  def hapaxRate(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val perTerm = docs
      .select(col(groupCol).as("__g"),
        explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("__g", "term").agg(count(lit(1)).as("__c"))
    perTerm.groupBy("__g")
      .agg(count(lit(1)).as("n_types"),
        sum("__c").as("n_tokens"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("__g").as(groupCol),
        col("n_types").cast("long").as("n_types"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_hapax").cast("long").as("n_hapax"),
        expr("(1000000 * n_hapax) div n_types").as("hapax_micro"))
  }

  /**
   * Zipf-law fit — the corpus-statistics card: ordinary least squares
   * of log10(count) on log10(rank) over the term-frequency table. A
   * natural-language corpus fits slope ≈ −1 with r² near 1; template
   * spam, boilerplate floods, and synthetic text bend the line — a
   * one-row distribution fingerprint.
   *
   * Exactness: both logs quantize to the 6-dp grid (the package
   * discipline), ALL sums and cross-products accumulate in exact
   * DECIMAL, and the slope/intercept/r² are single fixed-order double
   * divisions of those exact moments, rounded to 6 dp. The frequency
   * table is vocabulary-sized; its rank window runs on the pinned
   * single-partition key (bounded-relation metadata, never a corpus
   * sort).
   *
   * @return one row: (n_types, n_tokens, slope, intercept, r2)
   */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val w = Window
      .partitionBy(Retrieval.singlePartitionKey(col("term")))
      .orderBy(col("cnt").desc, col("term"))
    val xy = freq.withColumn("rank", row_number().over(w))
      .select(col("cnt"),
        round(log10(col("rank")), 6).cast("decimal(18,6)").as("x"),
        round(log10(col("cnt")), 6).cast("decimal(18,6)").as("y"))
    val m = xy.agg(
      count(lit(1)).as("n"),
      sum(col("cnt")).as("n_tokens"),
      sum(col("x")).cast("decimal(38,6)").as("sx"),
      sum(col("y")).cast("decimal(38,6)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("sxy"))
    // exact decimal moments → fixed-order double arithmetic once
    m.select(col("n").as("n_types"), col("n_tokens"),
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("__num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("__dx"),
        (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("__dy"),
        col("sx").cast("double").as("__sx"),
        col("sy").cast("double").as("__sy"),
        col("n").cast("double").as("__nd"))
      .select(col("n_types"), col("n_tokens"),
        // dx = 0 only for a 0/1-type corpus; dy = 0 for constant
        // counts (then r² is undefined — NULL, visibly)
        round(when(col("__dx") > 0, col("__num") / col("__dx")), 6)
          .as("slope"),
        round(when(col("__dx") > 0,
          (col("__sy") - col("__num") / col("__dx") * col("__sx"))
            / col("__nd")), 6).as("intercept"),
        round(when(col("__dx") * col("__dy") > 0,
          col("__num") * col("__num") / (col("__dx") * col("__dy"))), 6)
          .as("r2"))
  }

  /**
   * Heaps'-law fit — [[zipfFit]]'s companion: vocabulary growth
   * V(N) ≈ K·N^β measured at doubling corpus prefixes (N = 2^j), then
   * log-log OLS for β (natural text: β ≈ 0.4–0.6; near-duplicate
   * floods depress it, random noise pushes it toward 1). The corpus
   * order is the deterministic (idCol, position) order.
   *
   * Shape: global token positions come from a doc-offset prefix sum
   * over the DOC-COUNT-sized (id, n_tokens) relation (window on the
   * pinned single-partition key — bounded metadata, never a corpus
   * sort); each term reduces to its FIRST global position (one min
   * aggregate); V(2^j) is one small join + aggregate over the
   * sample-point relation.
   *
   * @return (n_points, beta, log10_k, r2) — one row.
   */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__t"))
    val sizes = toks.select(col("__id"), size(col("__t")).cast("long").as("__n"))
    val w = Window.partitionBy(Retrieval.singlePartitionKey(col("__id")))
      .orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = sizes
      .withColumn("__off", sum("__n").over(w) - col("__n"))
    val firstPos = toks.join(offsets, "__id")
      .select(posexplode(col("__t")).as(Seq("__p", "term")),
        col("__off"))
      .groupBy("term")
      .agg(min(col("__off") + col("__p") + 1).as("__fp"))
    val total = offsets.agg(sum("__n").as("__tot"))
    // sample points 2^j ≤ total — a ≤64-row generated relation
    val pts = firstPos.sparkSession.range(1, 63)
      .select(expr("CAST(pow(2, id) AS BIGINT)").as("__m"))
      .crossJoin(broadcast(total))
      .filter(col("__m") <= col("__tot"))
    // vocabulary × ≤64 sample points: the 64-row side broadcasts, so
    // the inequality join is a bounded nested loop by construction
    val vn = firstPos
      .join(broadcast(pts.select("__m")), col("__fp") <= col("__m"))
      .groupBy("__m").agg(count(lit(1)).as("__v"))
    val xy = vn.select(
      round(log10(col("__m")), 6).cast("decimal(18,6)").as("x"),
      round(log10(col("__v")), 6).cast("decimal(18,6)").as("y"))
    val m = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("decimal(38,6)").as("sx"),
      sum(col("y")).cast("decimal(38,6)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("sxy"))
    m.select(col("n").as("n_points"),
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("__num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("__dx"),
        (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("__dy"),
        col("sx").cast("double").as("__sx"),
        col("sy").cast("double").as("__sy"),
        col("n").cast("double").as("__nd"))
      .select(col("n_points"),
        round(when(col("__dx") > 0, col("__num") / col("__dx")), 6)
          .as("beta"),
        round(when(col("__dx") > 0,
          (col("__sy") - col("__num") / col("__dx") * col("__sx"))
            / col("__nd")), 6).as("log10_k"),
        round(when(col("__dx") * col("__dy") > 0,
          col("__num") * col("__num") / (col("__dx") * col("__dy"))), 6)
          .as("r2"))
  }

  /**
   * TextRank keyterm extraction (Mihalcea & Tarau 2004) — the
   * unsupervised keyphrase recipe: build the word co-occurrence graph
   * (adjacent-token pairs, both directions, candidate terms only) and
   * rank terms by [[LinkRank.pageRank]]'s integer-exact PageRank.
   * Terms central to many contexts outrank merely frequent ones —
   * the corpus-vocabulary card TF-IDF can't give (TF-IDF needs a
   * contrasting corpus; TextRank needs only the graph).
   *
   * Candidates stand in for the paper's POS filter with a declared
   * length floor (`minLen`) — no tagger at 100 TB. Shape: one
   * scan-local explode to adjacent pairs, a DISTINCT to the simple
   * graph (vocabulary-sized, NOT corpus-sized — the iteration cost is
   * independent of corpus row count), then the shared integer
   * PageRank loop and one top-k.
   *
   * @return (term, rank_micros) — the `k` highest-ranked terms,
   *         ties by term.
   */
  def textRankTerms(
      docs: DataFrame, textCol: String, k: Int,
      minLen: Int = 4, iters: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // one codegen kernel pass emits both directions as (src, dst)
    // structs — the round-13 profile showed the previous
    // explode(sequence)/element_at/explode(array(struct)) pipeline
    // (a double Generate with per-pair array re-evaluation) was ~75%
    // of this operator's cost; the kernel ≡ that formulation is
    // spec-pinned in TextAnalysisSpec
    val edges = docs
      .filter(col(textCol).isNotNull)
      .select(explode(graft.functions.GraftFunctions
        .adjacentTokenPairs(col(textCol), minLen)).as("e"))
      .select("e.src", "e.dst")
    LinkRank.pageRank(edges, iters = iters)
      .select(col("domain").as("term"), col("rank_micros"))
      .orderBy(col("rank_micros").desc, col("term"))
      .limit(k)
  }

  /**
   * Spearman rank correlation between two numeric columns — the
   * feature-redundancy check before features enter a quality
   * classifier (monotone association, outlier-proof where Pearson is
   * not). Computed as Pearson over DOUBLED average ranks
   * `u = 2·rank_min + ties − 1` (an exact INTEGER even for tied
   * groups, where the average rank itself is a half), with the
   * standard tie-corrected identity: every sum is an exact
   * DECIMAL(38)/HUGEINT, and the one sqrt+division runs on those
   * integers in a fixed order rounded to 6 dp. Bound: n⁴ must fit 38
   * digits — fine to ~10⁹ rows.
   *
   * Shape: ranking is two global sorts (inherent to rank
   * correlation — an offline stats card, not a hot-path operator),
   * then one exact aggregate.
   */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("x"), col(yCol).as("y"))
    val ranked = base
      .withColumn("rx", rank().over(Window.partitionBy(lit(1)).orderBy("x")))
      .withColumn("cx", count(lit(1)).over(Window.partitionBy("x")))
      .withColumn("ry", rank().over(Window.partitionBy(lit(1)).orderBy("y")))
      .withColumn("cy", count(lit(1)).over(Window.partitionBy("y")))
      .select((lit(2L) * col("rx") + col("cx") - 1).as("u"),
        (lit(2L) * col("ry") + col("cy") - 1).as("v"))
    val dec = "DECIMAL(38,0)"
    ranked
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(u AS $dec)")).as("su"),
        sum(expr(s"CAST(v AS $dec)")).as("sv"),
        sum(expr(s"CAST(u AS $dec) * v")).as("suv"),
        sum(expr(s"CAST(u AS $dec) * u")).as("suu"),
        sum(expr(s"CAST(v AS $dec) * v")).as("svv"))
      .select(col("n"),
        round(
          expr(s"CAST(CAST(n AS $dec) * suv - su * sv AS DOUBLE)") /
            (sqrt(expr(s"CAST(CAST(n AS $dec) * suu - su * su AS DOUBLE)")) *
              sqrt(expr(s"CAST(CAST(n AS $dec) * svv - sv * sv AS DOUBLE)"))),
          6).as("rho"))
  }

  /**
   * Corpus token entropy card (Shannon 1948 over the unigram
   * distribution): H = Σ (c/N)·log₂(N/c) in bits, plus the maximum
   * log₂(V) — the redundancy read (H far below log₂ V ⇔ the corpus
   * leans on few tokens; near it ⇔ flat/noisy vocabulary). Complements
   * the Zipf-slope card with a single-number summary.
   *
   * The package log discipline: log₂ of exact integer counts, rounded
   * to 6 dp BEFORE the multiply; per-token terms c·(log₂N − log₂c)
   * sum exactly in DECIMAL; one integral micro division at the end —
   * bit-reproducible and SQL-replayable.
   *
   * Shape: one token-frequency aggregate (map-side combined), a 1-row
   * totals broadcast, one bounded reduce over the vocabulary relation.
   */
  def tokenEntropy(docs: DataFrame, textCol: String): DataFrame = {
    val c = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val tot = c.agg(sum("__c").as("__n"),
      count(lit(1)).as("n_distinct"))
    c.crossJoin(broadcast(tot))
      .select(col("__n"), col("n_distinct"),
        expr("""CAST(__c AS DECIMAL(38,6)) *
               | (CAST(round(log2(__n), 6) AS DECIMAL(28,6))
               |  - CAST(round(log2(__c), 6) AS DECIMAL(28,6)))"""
          .stripMargin.replace("\n", " ")).as("__term"))
      .groupBy(col("__n"), col("n_distinct"))
      .agg(sum("__term").as("__s"))
      .select(col("__n").cast("long").as("n_tokens"),
        col("n_distinct"),
        expr("CAST(CAST(__s * 1000000 AS DECIMAL(38,0)) div __n AS BIGINT)")
          .as("entropy_micro"),
        expr("CAST(CAST(round(log2(n_distinct), 6) AS DECIMAL(28,6)) * 1000000 AS BIGINT)")
          .as("max_entropy_micro"))
  }
}
