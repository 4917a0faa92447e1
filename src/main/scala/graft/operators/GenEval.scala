package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generation-eval overlap metrics — the standard lexical scores for
 * model outputs against references: corpus BLEU (Papineni et al.
 * 2002), corpus chrF (Popović 2015), per-pair token-F1 (the SQuAD
 * answer metric) and ROUGE-n (Lin 2004). All are MULTISET overlaps:
 * overlap_n = Σ_gram min(cnt_pred(gram), cnt_gold(gram)) over order-n
 * units, then precision = overlap/|pred grams|, recall =
 * overlap/|gold grams| — reported on the micro grid via integral
 * division, so every engine agrees exactly.
 *
 * Shape: pred and gold live in the SAME ROW, so the clipped overlap
 * is scan-local — one `ngram_overlap_counts` codegen kernel call per
 * pair emits the 3·maxN exact integers `[overlap_n, total_pred_n,
 * total_gold_n]`, and the corpus metrics reduce them with ONE global
 * sum (map-side partials, a single 1-row exchange). No explode, no
 * per-gram shuffle, no join. At 100 TB of eval pairs each corpus
 * metric is one scan and an 18-integer reduce; the per-pair metrics
 * are a pure projection. (The previous formulation — per-order HOF
 * explode to (id, n, gram) rows, hash aggregate, full-outer STRING
 * join — shuffled every character position × order and went
 * super-linear on the 10× scale step: 14–40 s at sf0.1 for chrF vs
 * scan-bound now.)
 *
 * Pair identity: each ROW is one (pred, gold) pair and `idCol` is its
 * unique key — duplicate ids are scored per row, not merged.
 */
object GenEval {

  /** Per-row 3·maxN clipped-overlap counts; registers the engine
    * functions on the pairs' session first (idempotent). */
  private def overlapCounts(
      pairs: DataFrame, predCol: String, goldCol: String,
      maxN: Int, charLevel: Boolean): Column = {
    GraftFunctions.register(pairs.sparkSession)
    GraftFunctions.ngramOverlapCounts(
      col(predCol), col(goldCol), maxN, charLevel)
  }

  /**
   * Corpus-level BLEU-`maxN` (Papineni et al. 2002): modified n-gram
   * precisions p_n = Σ clipped matches / Σ candidate n-grams for
   * n = 1..maxN, brevity penalty exp(min(0, 1 − r/c)), score =
   * BP · exp(Σ ln p_n / maxN). Every COUNT (clipped overlaps, totals,
   * candidate/reference lengths) is exact integer and exposed as
   * micro precisions; the one transcendental combination runs on
   * those integers in a FIXED expression order and rounds to 6 dp —
   * the package's accepted log-rounding class. Zero matches at any
   * order → bleu = 0 (the standard convention).
   *
   * Units are the single-space-split fields with empties kept (SQL
   * `split` semantics); a NULL side contributes zero n-grams on that
   * side while the other side still counts.
   */
  def corpusBleu(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val oc = overlapCounts(pairs, predCol, goldCol, maxN, charLevel = false)
    // one scan: 3·maxN integers per row, one global sum (+ total gold
    // unigrams for the brevity penalty, which is counts index 3)
    val aggs = (1 to maxN).flatMap { n =>
      Seq(sum(element_at(col("__c"), 3 * (n - 1) + 1)).as(s"o_$n"),
        sum(element_at(col("__c"), 3 * (n - 1) + 2)).as(s"t_$n"))
    } :+ sum(element_at(col("__c"), 3)).as("r")
    // widen: gram counting dominates; the sums are exact longs
    val one = Fanout.widen(pairs.select(oc.as("__c")))
      .agg(aggs.head, aggs.tail: _*)
    // t_n = 0 (no candidate n-grams anywhere) → p_n = 0, and o_n = 0
    // forces bleu = 0 through anyZero — total under ANSI mode instead
    // of an integral-division error
    val pCols = (1 to maxN).map(n =>
      when(col(s"t_$n") > 0,
        expr(s"(1000000 * o_$n) div t_$n")).otherwise(0L).as(s"p${n}_micro"))
    val lnSum = (1 to maxN).map(n =>
      log(col(s"o_$n").cast("double") / col(s"t_$n").cast("double")))
      .reduce(_ + _)
    val anyZero = (1 to maxN).map(n => col(s"o_$n") === 0).reduce(_ || _)
    val bp = least(lit(0.0),
      lit(1.0) - col("r").cast("double") / col("t_1").cast("double"))
    one.select((col("t_1").as("c") +: col("r").as("r") +: pCols) :+
      round(when(anyZero, lit(0.0))
        .otherwise(exp(bp + lnSum / maxN)), 6).as("bleu"): _*)
  }

  /**
   * Corpus-level chrF (Popović 2015): character n-gram F-beta
   * averaged over n = 1..`maxN`, whitespace stripped (the sacrebleu
   * convention). Per order: clipped multiset overlap as exact
   * integers, P/R as integral micros, Fβ = (1+β²)·P·R / (β²·P + R)
   * as one integral division, the final chrF the integral mean over
   * orders — no floating point anywhere. Orders with no overlap
   * contribute 0 (the convention).
   *
   * @return one row: (f1_micro..f<maxN>_micro, chrf_micro)
   */
  def corpusChrF(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      maxN: Int = 6, beta: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    require(beta >= 1, s"beta must be >= 1, got $beta")
    val oc = overlapCounts(pairs, predCol, goldCol, maxN, charLevel = true)
    val aggs = (1 to maxN).flatMap { n =>
      Seq(sum(element_at(col("__c"), 3 * (n - 1) + 1)).as(s"o_$n"),
        sum(element_at(col("__c"), 3 * (n - 1) + 2)).as(s"tp_$n"),
        sum(element_at(col("__c"), 3 * (n - 1) + 3)).as(s"tg_$n"))
    }
    // widen: gram counting dominates; the sums are exact longs
    val one = Fanout.widen(pairs.select(oc.as("__c")))
      .agg(aggs.head, aggs.tail: _*)
    val b2 = beta * beta
    one
      .select((1 to maxN).flatMap(n => Seq(
        // an order with no grams on a side scores 0 on that axis —
        // total under ANSI mode instead of a division error
        when(col(s"tp_$n") > 0,
          expr(s"(1000000 * o_$n) div tp_$n")).otherwise(0L).as(s"p_$n"),
        when(col(s"tg_$n") > 0,
          expr(s"(1000000 * o_$n) div tg_$n")).otherwise(0L).as(s"r_$n"))): _*)
      .select((1 to maxN).map(n =>
        when(expr(s"$b2 * p_$n + r_$n") > 0,
          expr(s"(${1 + b2} * p_$n * r_$n) div ($b2 * p_$n + r_$n)"))
          .otherwise(0L).as(s"f${n}_micro")): _*)
      .withColumn("chrf_micro",
        expr(s"(${(1 to maxN).map(n => s"f${n}_micro").mkString(" + ")}) " +
          s"div $maxN"))
  }

  /**
   * Corpus-level chrF++ (Popović 2017): chrF's character n-gram
   * F-beta orders (n = 1..`charMaxN`, whitespace stripped) PLUS word
   * n-gram orders (n = 1..`wordMaxN`, single-space tokens — the
   * package's tokenization convention; sacrebleu additionally splits
   * punctuation, a documented deviation), all averaged with equal
   * weight: chrf++ = (Σ f_char_n + Σ f_word_n) div (charMaxN +
   * wordMaxN). Same exact-integer micro grid as [[corpusChrF]];
   * same one-scan shape — BOTH kernels run in the same projection,
   * so the whole metric is still a single pass and one global sum of
   * 3·(charMaxN + wordMaxN) integers.
   *
   * @return one row: (fc1_micro..fc<charMaxN>_micro,
   *         fw1_micro..fw<wordMaxN>_micro, chrfpp_micro)
   */
  def corpusChrFpp(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      charMaxN: Int = 6, wordMaxN: Int = 2, beta: Int = 2): DataFrame = {
    require(charMaxN >= 1 && charMaxN <= 8,
      s"charMaxN must be in [1, 8], got $charMaxN")
    require(wordMaxN >= 1 && wordMaxN <= 8,
      s"wordMaxN must be in [1, 8], got $wordMaxN")
    require(beta >= 1, s"beta must be >= 1, got $beta")
    GraftFunctions.register(pairs.sparkSession)
    val occ = GraftFunctions.ngramOverlapCounts(
      col(predCol), col(goldCol), charMaxN, charLevel = true)
    val ocw = GraftFunctions.ngramOverlapCounts(
      col(predCol), col(goldCol), wordMaxN, charLevel = false)
    // (tag, order) pairs: c = char orders, w = word orders — one
    // flat list so the downstream select/F/mean code is shared
    val orders = (1 to charMaxN).map(("c", _)) ++ (1 to wordMaxN).map(("w", _))
    val aggs = orders.flatMap { case (t, n) =>
      val src = col(s"__$t")
      Seq(sum(element_at(src, 3 * (n - 1) + 1)).as(s"o_$t$n"),
        sum(element_at(src, 3 * (n - 1) + 2)).as(s"tp_$t$n"),
        sum(element_at(src, 3 * (n - 1) + 3)).as(s"tg_$t$n"))
    }
    // widen: the gram kernels are the whole cost and the sums are
    // exact longs — safe to fan out a one-row-group local scan
    val one = Fanout.widen(pairs.select(occ.as("__c"), ocw.as("__w")))
      .agg(aggs.head, aggs.tail: _*)
    val b2 = beta * beta
    val fNames = orders.map { case (t, n) => s"f$t${n}_micro" }
    one
      .select(orders.flatMap { case (t, n) => Seq(
        // an order with no grams on a side scores 0 on that axis —
        // total under ANSI mode instead of a division error
        when(col(s"tp_$t$n") > 0,
          expr(s"(1000000 * o_$t$n) div tp_$t$n")).otherwise(0L).as(s"p_$t$n"),
        when(col(s"tg_$t$n") > 0,
          expr(s"(1000000 * o_$t$n) div tg_$t$n")).otherwise(0L).as(s"r_$t$n")) }: _*)
      .select(orders.map { case (t, n) =>
        when(expr(s"$b2 * p_$t$n + r_$t$n") > 0,
          expr(s"(${1 + b2} * p_$t$n * r_$t$n) div ($b2 * p_$t$n + r_$t$n)"))
          .otherwise(0L).as(s"f$t${n}_micro") }: _*)
      .withColumn("chrfpp_micro",
        expr(s"(${fNames.mkString(" + ")}) div ${charMaxN + wordMaxN}"))
  }

  /**
   * Per-pair (sentence) BLEU-`maxN` with add-one smoothing (Lin &
   * Och 2004): p_1 stays unsmoothed; for n ≥ 2, p_n = (o_n + 1) /
   * (t_n + 1), so short segments score deterministically instead of
   * zeroing on one missing high-order match — the standard
   * segment-level quality filter for bitext/generation pairs. Zero
   * unigram matches → bleu = 0 (the convention). Counts and micro
   * precisions are exact integers; the one transcendental
   * combination runs in a FIXED expression order and rounds to 6 dp,
   * like [[corpusBleu]]. Pure projection — no shuffle; the clipped
   * counts are scan-local per row.
   *
   * @return (idCol, c, r, p1_micro..p<maxN>_micro, bleu) per pair
   */
  def sentenceBleu(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val oc = overlapCounts(pairs, predCol, goldCol, maxN, charLevel = false)
    val base = pairs
      .select(col(idCol), oc.as("__c"))
      .select(col(idCol) +:
        (1 to maxN).flatMap(n => Seq(
          element_at(col("__c"), 3 * (n - 1) + 1).as(s"o_$n"),
          element_at(col("__c"), 3 * (n - 1) + 2).as(s"t_$n"))) :+
        element_at(col("__c"), 3).as("r"): _*)
    val pCols = (1 to maxN).map { n =>
      if (n == 1)
        when(col("t_1") > 0,
          expr("(1000000 * o_1) div t_1")).otherwise(0L).as("p1_micro")
      else
        expr(s"(1000000 * (o_$n + 1)) div (t_$n + 1)").as(s"p${n}_micro")
    }
    val lnTerms = log(col("o_1").cast("double") / col("t_1").cast("double")) +:
      (2 to maxN).map(n => log((col(s"o_$n") + 1).cast("double") /
        (col(s"t_$n") + 1).cast("double")))
    val lnSum = lnTerms.reduce(_ + _)
    val bp = least(lit(0.0),
      lit(1.0) - col("r").cast("double") / col("t_1").cast("double"))
    base.select(col(idCol) +: col("t_1").as("c") +: col("r") +: pCols :+
      round(when(col("o_1") === 0, lit(0.0))
        .otherwise(exp(bp + lnSum / maxN)), 6).as("bleu"): _*)
  }

  /**
   * Per-pair edit error rate — CER (`unit = "byte"` or
   * `"codepoint"`) / WER (`unit = "token"`), the ASR/OCR eval
   * standard: Levenshtein distance over the chosen units, normalized
   * by the gold side's unit count on the exact micro grid. Byte mode
   * is bit-identical to DuckDB/ClickHouse `levenshtein`; codepoint
   * mode to Spark's builtin. Output: (idCol, edit_dist, n_gold,
   * err_micro); an empty gold scores 0 against an empty pred and
   * 1e6 (100%) otherwise; a NULL side yields NULL (the SQL
   * `levenshtein` convention). Pure projection — no shuffle; the DP
   * is scan-local per row ([[graft.functions.TextHashKernels.editDistance]]).
   */
  def editErrorRate(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      unit: String = "token"): DataFrame = {
    GraftFunctions.register(pairs.sparkSession)
    val dist = GraftFunctions.editDistance(col(predCol), col(goldCol), unit)
    val nGold = unit match {
      case "byte"      => octet_length(col(goldCol)).cast("long")
      case "codepoint" => length(col(goldCol)).cast("long")
      case "token"     => size(split(col(goldCol), " ")).cast("long")
      case other => throw new IllegalArgumentException(
        s"unit must be 'byte', 'codepoint' or 'token', got '$other'")
    }
    pairs
      .select(col(idCol), dist.as("edit_dist"), nGold.as("n_gold"))
      .withColumn("err_micro",
        when(col("n_gold") > 0,
          expr("(1000000 * edit_dist) div n_gold"))
          .otherwise(when(col("edit_dist") === 0, 0L).otherwise(1000000L)))
  }

  /**
   * Self-BLEU (Zhu et al. 2018) — the pairwise-similarity diversity
   * check that complements [[distinctN]]'s vocabulary view: mean
   * smoothed sentence BLEU-`maxN` over every ORDERED pair of a
   * deterministic FIXED-SIZE sample (the `sampleSize` rows with the
   * smallest seeded-md5 rank, the [[DatasetSplit.balancedSample]]
   * discipline; self-pairs excluded). High self-BLEU ⇔ generations
   * paraphrase each other even when their n-gram vocabulary looks
   * diverse. Per-pair scores are [[sentenceBleu]]'s 6-dp doubles
   * summed EXACTLY in DECIMAL; the one mean division rounds to 6 dp.
   *
   * Scale: the pair grid is ≤ `sampleSize`² BY CONSTRUCTION —
   * independent of corpus size, unlike a fixed-RATE (modulus) sample
   * whose grid grows quadratically with the corpus. The sample is a
   * `TakeOrdered` over the md5 rank (one scan, k rows to the driver
   * side of the exchange), and the kernel-based pair scoring is
   * scan-local on the bounded grid (no per-gram shuffle).
   */
  def selfBleu(
      docs: DataFrame, idCol: String, textCol: String,
      sampleSize: Int = 250, seed: String = "graft", maxN: Int = 2): DataFrame = {
    require(sampleSize >= 2, s"sampleSize must be >= 2, got $sampleSize")
    val samp = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), col(textCol).as("__t"),
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
          .cast("binary")).as("__h"))
      .orderBy(col("__h"), col("__id"))
      .limit(sampleSize)
      .select(col("__id"), col("__t"))
    // widen the stream side: limit() collapses the sample to ONE
    // partition, so the sampleSize² BLEU kernels would all run in a
    // single task; the pair work is bounded by sampleSize² at ANY
    // corpus scale and the final agg is an exact decimal sum, so the
    // fan-out is always partitioning-safe.
    val a = Fanout.widen(
      samp.select(col("__id").as("__ia"), col("__t").as("pred")))
    val b = samp.select(col("__id").as("__ib"), col("__t").as("gold"))
    val pairs = a.crossJoin(b).filter(col("__ia") =!= col("__ib"))
      .select((col("__ia") * 1000000L + col("__ib")).as("pid"),
        col("pred"), col("gold"))
    sentenceBleu(pairs, "pid", "pred", "gold", maxN)
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("bleu").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("self_bleu"))
  }

  /**
   * Corpus diversity card — distinct-n (Li et al. 2016): the share of
   * UNIQUE token n-grams among all n-gram instances for n = 1..maxN,
   * the standard mode-collapse check on model generations (low
   * distinct-2 ⇔ repetitive output). Exact integers: counts and one
   * integral micro division per order.
   *
   * Scale note: the global distinct is inherent to the metric (an
   * n-gram string shuffle per order); at 100 TB swap the exact
   * distinct for the HLL sketch relation (`sketch_hll_distinct`) —
   * the counts grid is the same. The n-grams themselves come from the
   * `ngram_strings` codegen kernel (one byte-slice view per gram, no
   * concatenation), not the `transform(sequence(...))` HOF pipeline —
   * that CodegenFallback Generate was this metric's whole per-row
   * cost (`NgramMlmKernelsSpec` pins kernel ≡ HOF;
   * `NgramMlmPlanSpec` guards the one-call plan shape).
   */
  def distinctN(docs: DataFrame, textCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    GraftFunctions.register(docs.sparkSession)
    (1 to maxN).map { n =>
      docs.filter(col(textCol).isNotNull)
        .select(explode(
          GraftFunctions.ngramStrings(col(textCol), n)).as("g"))
        .agg(count(lit(1)).as("n_total"),
          countDistinct(col("g")).as("n_distinct"))
        .select(lit(n.toLong).as("n"), col("n_total"), col("n_distinct"),
          when(col("n_total") > 0,
            expr("(1000000 * n_distinct) div n_total")).otherwise(0L)
            .as("distinct_micro"))
    }.reduce(_ unionAll _)
  }

  /**
   * Per-pair n-gram overlap F1 (n = 1 is token-F1). Output: (idCol,
   * n_pred, n_gold, overlap, p_micro, r_micro, f1_micro) — pairs
   * where either side has no n-grams score zero, not NULL (the
   * standard convention: an empty prediction is a wrong prediction).
   * Pure projection — no shuffle at all.
   */
  def overlapF1(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      n: Int = 1): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")
    val oc = overlapCounts(pairs, predCol, goldCol, n, charLevel = false)
    pairs
      .select(col(idCol), oc.as("__c"))
      .select(col(idCol),
        element_at(col("__c"), 3 * (n - 1) + 2).as("n_pred"),
        element_at(col("__c"), 3 * (n - 1) + 3).as("n_gold"),
        element_at(col("__c"), 3 * (n - 1) + 1).as("overlap"))
      .withColumn("p_micro",
        when(col("n_pred") > 0,
          expr("(1000000 * overlap) div n_pred")).otherwise(0L))
      .withColumn("r_micro",
        when(col("n_gold") > 0,
          expr("(1000000 * overlap) div n_gold")).otherwise(0L))
      .withColumn("f1_micro",
        when(col("n_pred") + col("n_gold") > 0,
          expr("(2000000 * overlap) div (n_pred + n_gold)"))
          .otherwise(0L))
  }
}
