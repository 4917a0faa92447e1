package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generation-eval overlap metrics — the two standard lexical scores
 * for model outputs against references: token-level F1 (the SQuAD
 * answer metric) and ROUGE-n (the summarization metric, Lin 2004).
 * Both are MULTISET overlaps: overlap = Σ_t min(cnt_pred(t),
 * cnt_gold(t)) over tokens (F1) or n-grams (ROUGE-n), then precision
 * = overlap/|pred|, recall = overlap/|gold| — reported on the micro
 * grid via integral division, so every engine agrees exactly.
 *
 * Shape: explode each side to (id, unit) counts (map-side partials),
 * ONE inner join on (id, unit), a per-id sum — everything partitions
 * by the pair id; no global state, no windows. At 100 TB of eval
 * pairs this is two scans and one id-keyed exchange.
 */
object GenEval {

  /** (id, n-gram) counts of a text column: n = 1 gives tokens. The
    * token split is PROJECTED before the transform — an expression
    * inside a HOF lambda re-evaluates per element, so an unhoisted
    * split would re-tokenize the text once per emitted n-gram. */
  private def unitCounts(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      cntName: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__t"))
    val toks = col("__t")
    val units =
      if (n == 1) explode(toks)
      else explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(o =>
            element_at(toks, i + o)): _*)))
        .otherwise(array()))
    base
      .select(col("__id"), units.as("__u"))
      .groupBy("__id", "__u")
      .agg(count(lit(1)).as(cntName))
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
   * Shape: one tagged explode per side ((id, n, unit) counts), ONE
   * join, one corpus aggregate to a single row.
   */
  def corpusBleu(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    def tagged(textCol: String, cntName: String): DataFrame = {
      // split projected once per row — inside the HOF lambdas it
      // would re-evaluate per emitted n-gram
      val base = pairs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("__id"),
          split(col(textCol), " ").as("__t"))
      val toks = col("__t")
      val all = concat((1 to maxN).map { n =>
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)), i =>
            struct(lit(n).as("n"),
              concat_ws(" ", (0 until n).map(o =>
                element_at(toks, i + o)): _*).as("u"))))
          .otherwise(array().cast("array<struct<n:int,u:string>>"))
      }: _*)
      base
        .select(col("__id"), explode(all).as("__e"))
        .groupBy(col("__id"), col("__e.n").as("__n"),
          col("__e.u").as("__u"))
        .agg(count(lit(1)).as(cntName))
    }
    val pc = tagged(predCol, "__cp")
    val gc = tagged(goldCol, "__cg")
    val perN = pc.join(gc, Seq("__id", "__n", "__u"), "left")
      .groupBy("__n")
      .agg(sum(least(col("__cp"), coalesce(col("__cg"), lit(0L))))
          .as("__o"),
        sum("__cp").as("__t"))
    val r = gc.filter(col("__n") === 1).agg(sum("__cg").as("r"))
    val parts = (1 to maxN).map { n =>
      perN.filter(col("__n") === n).select(
        col("__o").as(s"o_$n"), col("__t").as(s"t_$n"))
    }
    val one = parts.reduce(_.crossJoin(_)).crossJoin(r)
    val pCols = (1 to maxN).map(n =>
      expr(s"(1000000 * o_$n) div t_$n").as(s"p${n}_micro"))
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
   * contribute 0 (the convention); orders with no candidate n-grams
   * at all are skipped from the mean like sacrebleu does — here the
   * fixture always has them, so the mean divides by `maxN`.
   *
   * @return one row: (f1_micro..f<maxN>_micro, chrf_micro)
   */
  def corpusChrF(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      maxN: Int = 6, beta: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    require(beta >= 1, s"beta must be >= 1, got $beta")
    def tagged(textCol: String, cntName: String): DataFrame = {
      // the stripped string is projected once per row — inside the
      // HOF lambdas the regexp_replace would re-run per emitted
      // n-gram (measured: 47 s → ~2 s on the sf0.1 bench row)
      val base = pairs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("__id"),
          regexp_replace(col(textCol), " ", "").as("__s"))
      val st = col("__s")
      val all = concat((1 to maxN).map { n =>
        when(length(st) >= n,
          transform(sequence(lit(1), length(st) - (n - 1)), i =>
            struct(lit(n).as("n"), st.substr(i, lit(n)).as("u"))))
          .otherwise(array().cast("array<struct<n:int,u:string>>"))
      }: _*)
      base
        .select(col("__id"), explode(all).as("__e"))
        .groupBy(col("__id"), col("__e.n").as("__n"),
          col("__e.u").as("__u"))
        .agg(count(lit(1)).as(cntName))
    }
    val pc = tagged(predCol, "__cp")
    val gc = tagged(goldCol, "__cg")
    val perN = pc.join(gc, Seq("__id", "__n", "__u"), "full_outer")
      .groupBy("__n")
      .agg(
        sum(least(coalesce(col("__cp"), lit(0L)),
          coalesce(col("__cg"), lit(0L)))).as("__o"),
        sum(coalesce(col("__cp"), lit(0L))).as("__tp"),
        sum(coalesce(col("__cg"), lit(0L))).as("__tg"))
      .select(col("__n"),
        expr("(1000000 * __o) div __tp").as("__p"),
        expr("(1000000 * __o) div __tg").as("__r"))
      .select(col("__n"),
        when(expr(s"${beta * beta} * __p + __r") > 0,
          expr(s"(${1 + beta * beta} * __p * __r) div " +
            s"(${beta * beta} * __p + __r)")).otherwise(0L).as("__f"))
    val parts = (1 to maxN).map(n =>
      perN.filter(col("__n") === n)
        .select(col("__f").as(s"f${n}_micro")))
    parts.reduce(_.crossJoin(_))
      .withColumn("chrf_micro",
        expr(s"(${(1 to maxN).map(n => s"f${n}_micro").mkString(" + ")}) " +
          s"div $maxN"))
  }

  /**
   * Per-pair n-gram overlap F1 (n = 1 is token-F1). Output: (idCol,
   * n_pred, n_gold, overlap, p_micro, r_micro, f1_micro) — pairs
   * where either side has no n-grams score zero, not NULL (the
   * standard convention: an empty prediction is a wrong prediction).
   */
  def overlapF1(
      pairs: DataFrame, idCol: String, predCol: String, goldCol: String,
      n: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val pc = unitCounts(pairs, idCol, predCol, n, "__cp")
    val gc = unitCounts(pairs, idCol, goldCol, n, "__cg")
    val joined = pc.join(gc, Seq("__id", "__u"))
      .groupBy("__id")
      .agg(sum(least(col("__cp"), col("__cg"))).as("overlap"))
    val totals = pairs.select(col(idCol).as("__id"),
      col(predCol), col(goldCol))
      .join(pc.groupBy("__id").agg(sum("__cp").as("n_pred")), Seq("__id"), "left")
      .join(gc.groupBy("__id").agg(sum("__cg").as("n_gold")), Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"))
    totals.join(joined, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_pred"), col("n_gold"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
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
