package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multinomial Naive Bayes text classifier (the fastText-baseline
 * family; McCallum & Nigam 1998) — the other half of the pipeline's
 * supervised bootstrap: [[QualityClassifier]] is a logistic model
 * over NUMERIC document features, this is the generative model over
 * the TOKENS themselves, the standard first classifier for
 * language/source/domain routing when labels exist. Training is pure
 * counting — one grouped aggregate per relation — which is why NB is
 * the one classifier that needs no gradient loop and fits in a single
 * Spark pass at any scale.
 *
 * Determinism discipline (same as [[UnigramLm]]): every log lives on
 * a 6-dp micro grid — `round(log10(x), 6)` per TERM, differenced in
 * DECIMAL, scaled to a Long — so model weights and argmax decisions
 * are bit-stable across engines and partitionings. Ties in the
 * class argmax break toward the lexicographically smaller class;
 * vocabulary truncation ties break toward the smaller token.
 *
 * Model shape (100 TB design): the vocabulary is a FIXED-SIZE top-N
 * by global train-set frequency, so the likelihood relation is
 * |classes| × N rows regardless of corpus size — it broadcasts.
 * Fit = two grouped aggregates over the token stream (vocab, then
 * (class, token) counts); predict = one explode + one broadcast join
 * + one (doc, class) partial-aggregated sum. Out-of-vocabulary
 * tokens are DROPPED at inference (the standard truncated-vocab
 * convention), not OOV-smoothed, so a document of only OOV tokens
 * falls back to the class priors.
 */
object NaiveBayes {

  /** Laplace-smoothed log-likelihood table over the top-`vocabSize`
    * train tokens: (cls, token, cnt, loglik_micro) — one row per
    * class × vocab token (cnt = 0 rows included: the smoothing mass),
    * loglik = log10((cnt + 1) / (classTokens + |V|)) on the 6-dp
    * micro grid. Bounded at |classes|·vocabSize rows by construction.
    */
  def fit(
      docs: DataFrame, clsCol: String, textCol: String,
      vocabSize: Int = 512): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val toks = docs
      .filter(col(textCol).isNotNull && col(clsCol).isNotNull)
      .select(col(clsCol).as("cls"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) >= 1)

    // Fixed-SIZE vocabulary: top-N by global count, token tie-break —
    // the bounded-model knob that keeps the likelihood relation
    // broadcastable at any corpus size.
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("token"))
      .limit(vocabSize)
      .select("token")

    val cnts = toks.join(broadcast(vocab), "token")
      .groupBy("cls", "token").agg(count(lit(1)).as("cnt"))
    val grid = toks.select("cls").distinct()
      .crossJoin(broadcast(vocab))
      .join(broadcast(cnts), Seq("cls", "token"), "left")
      .select(col("cls"), col("token"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    // Per-class totals and |V| as windows over the BOUNDED grid
    // (|classes| × vocabSize rows by construction): one exchange on
    // cls replaces two aggregate jobs, a broadcast, a cross join and a
    // re-derivation of the grid subtree. Same values: each class's
    // grid partition is exactly the vocab, so count(*) over it is |V|
    // and sum(cnt) over it is the class token total.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cls")
    grid
      .select(col("cls"), col("token"), col("cnt"),
        ((round(log10(col("cnt") + lit(1)), 6).cast("decimal(28,6)") -
          round(log10(sum("cnt").over(w) + count(lit(1)).over(w)), 6)
            .cast("decimal(28,6)")) *
          lit(1000000)).cast("long").as("loglik_micro"))
  }

  /** Class priors on the same grid: (cls, n, prior_micro),
    * prior = log10(n_cls / n) — one row per class. */
  def priors(docs: DataFrame, clsCol: String, textCol: String): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull && col(clsCol).isNotNull)
    // Total doc count as a single-partition window over the BOUNDED
    // per-class relation (Σ class counts ≡ the filtered total, because
    // groupBy partitions d exactly): drops the separate total
    // aggregate, its broadcast and the cross join.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    d.groupBy(col(clsCol).as("cls")).agg(count(lit(1)).as("n"))
      .select(col("cls"), col("n"),
        ((round(log10(col("n")), 6).cast("decimal(28,6)") -
          round(log10(sum("n").over(w)), 6).cast("decimal(28,6)")) *
          lit(1000000)).cast("long").as("prior_micro"))
  }

  /** MAP prediction: argmax over classes of prior + Σ token
    * log-likelihoods (vocab tokens only), ties to the smaller class.
    * @return (id, actual, predicted, score_micro) for every input
    *         doc — docs with zero vocab tokens score on priors alone.
    */
  def predict(
      docs: DataFrame, idCol: String, clsCol: String, textCol: String,
      model: DataFrame, priorTable: DataFrame): DataFrame = {
    val base = docs
      .filter(col(textCol).isNotNull && col(clsCol).isNotNull)
      .select(col(idCol).as("id"), col(clsCol).as("actual"), col(textCol).as("__t"))
    // Per-token class likelihoods: each token row fans out to the
    // |classes| model rows for that token — the broadcast join keeps
    // the corpus un-shuffled; the (id, cls) sum partial-aggregates.
    val ll = base
      .select(col("id"), explode(split(col("__t"), " ")).as("token"))
      .filter(length(col("token")) >= 1)
      .join(broadcast(model.select(col("cls"), col("token"), col("loglik_micro"))),
        "token")
      .groupBy("id", "cls")
      .agg(sum("loglik_micro").as("__ll"))
    base.select("id", "actual")
      .crossJoin(broadcast(priorTable.select(col("cls"), col("prior_micro"))))
      .join(ll, Seq("id", "cls"), "left")
      .select(col("id"), col("actual"), col("cls"),
        (col("prior_micro") + coalesce(col("__ll"), lit(0L))).as("score"))
      .groupBy("id", "actual")
      .agg(min(struct((-col("score")).as("__neg"), col("cls").as("__cls"),
        col("score").as("__s"))).as("__m"))
      .select(col("id"), col("actual"),
        col("__m.__cls").as("predicted"),
        col("__m.__s").as("score_micro"))
  }

  /**
   * Fused k-fold prediction: every fold's held-out slice scored
   * against its OWN fold's model/priors in ONE corpus pass, instead
   * of k independent [[predict]] plans. The per-fold model and prior
   * relations (bounded at |classes|·vocabSize and |classes| rows)
   * are stacked with a fold key and broadcast once; each document
   * routes to its fold's rows through the (fold, token) / (fold)
   * join keys. Row-for-row identical to unioning k [[predict]] calls
   * over `docs.filter(foldOf === f)` (spec-pinned) — same argmax,
   * same tie-breaks — at 1/k the corpus passes and a fraction of the
   * exchanges.
   *
   * @param foldOf fold assignment expression; must take values
   *               0 until models.size over `docs`
   * @return (fold, id, actual, predicted, score_micro)
   */
  def predictFolds(
      docs: DataFrame, idCol: String, clsCol: String, textCol: String,
      foldOf: org.apache.spark.sql.Column,
      models: Seq[(DataFrame, DataFrame)]): DataFrame = {
    val modelAll = models.zipWithIndex.map { case ((m, _), f) =>
      m.select(lit(f.toLong).as("__fold"), col("cls"), col("token"),
        col("loglik_micro"))
    }.reduce(_ unionByName _)
    val priorAll = models.zipWithIndex.map { case ((_, p), f) =>
      p.select(lit(f.toLong).as("__fold"), col("cls"), col("prior_micro"))
    }.reduce(_ unionByName _)
    val base = docs
      .filter(col(textCol).isNotNull && col(clsCol).isNotNull)
      .select(foldOf.cast("long").as("__fold"), col(idCol).as("id"),
        col(clsCol).as("actual"), col(textCol).as("__t"))
    val ll = base
      .select(col("__fold"), col("id"),
        explode(split(col("__t"), " ")).as("token"))
      .filter(length(col("token")) >= 1)
      .join(broadcast(modelAll), Seq("__fold", "token"))
      .groupBy("__fold", "id", "cls")
      .agg(sum("loglik_micro").as("__ll"))
    base.select("__fold", "id", "actual")
      .join(broadcast(priorAll), Seq("__fold"))
      .join(ll, Seq("__fold", "id", "cls"), "left")
      .select(col("__fold"), col("id"), col("actual"), col("cls"),
        (col("prior_micro") + coalesce(col("__ll"), lit(0L))).as("score"))
      .groupBy("__fold", "id", "actual")
      .agg(min(struct((-col("score")).as("__neg"), col("cls").as("__cls"),
        col("score").as("__s"))).as("__m"))
      .select(col("__fold").as("fold"), col("id"), col("actual"),
        col("__m.__cls").as("predicted"),
        col("__m.__s").as("score_micro"))
  }

  /** Confusion-matrix card over [[predict]] output. */
  def confusion(pred: DataFrame): DataFrame =
    pred.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")

  /**
   * Discriminative-token card: per class, the `topPerClass` tokens
   * ranked by the Haldane-corrected log-odds ratio of DOCUMENT-level
   * presence —
   *
   *   score = log10((2a+1)(2d+1)) − log10((2b+1)(2c+1))
   *
   * with a = class docs containing the token, b = class docs without,
   * c/d the same outside the class (doubling before the +1 keeps the
   * ½ Haldane–Anscombe correction integral). The feature-selection
   * stage between the raw vocab and a classifier — the same question
   * χ² answers, but the products stay PAIRWISE (≤ (2N+1)², inside
   * DECIMAL(38,0) at any corpus size) where χ²'s N·(ad−bc)² cross
   * term overflows the exact grid at ~10⁷ docs; the Monroe et al.
   * 2008 "Fightin' Words" family uses the same log-odds shape for the
   * same reason. Logs on the 6-dp micro grid ([[fit]]'s convention).
   *
   * Shape: one distinct (class, token, doc) presence aggregate over
   * vocab tokens, one (class, token) count, class totals broadcast —
   * bounded at |classes|·vocabSize rows before the top-k cut.
   *
   * @return (cls, token, a, score_micro, rank) — rank 1..topPerClass
   *         by (score desc, token), ordered by (cls, rank).
   */
  def featureLogOdds(
      docs: DataFrame, idCol: String, clsCol: String, textCol: String,
      vocabSize: Int = 512, topPerClass: Int = 10): DataFrame = {
    require(topPerClass >= 1, s"topPerClass must be >= 1, got $topPerClass")
    val base = docs
      .filter(col(textCol).isNotNull && col(clsCol).isNotNull)
      .select(col(idCol).as("id"), col(clsCol).as("cls"), col(textCol).as("__t"))
    val toks = base.select(col("id"), col("cls"),
      explode(split(col("__t"), " ")).as("token"))
      .filter(length(col("token")) >= 1)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("token"))
      .limit(vocabSize)
      .select("token")
    // document-level presence, not occurrence counts
    val pres = toks.join(broadcast(vocab), "token")
      .select("id", "cls", "token").distinct()
    val a = pres.groupBy("cls", "token").agg(count(lit(1)).as("a"))
    // Corpus total as a single-partition window over the BOUNDED
    // per-class counts (Σ __nc ≡ count(base) because groupBy
    // partitions base exactly): no separate total aggregate, no
    // broadcast, no cross join, no second corpus pass.
    val clsTot = base.groupBy("cls").agg(count(lit(1)).as("__nc"))
      .withColumn("__n", sum("__nc").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val grid = clsTot.crossJoin(broadcast(vocab))
      .join(broadcast(a), Seq("cls", "token"), "left")
      .select(col("cls"), col("token"), col("__nc"), col("__n"),
        coalesce(col("a"), lit(0L)).as("a"))
    // c = token docs outside the class; needs the token's GLOBAL doc
    // count — a vocab-sized broadcast relation.
    val tokTot = pres.groupBy("token").agg(count(lit(1)).as("__nt"))
    grid
      .join(broadcast(tokTot), Seq("token"), "left")
      .withColumn("__nt", coalesce(col("__nt"), lit(0L)))
      .withColumn("b", col("__nc") - col("a"))
      .withColumn("c", col("__nt") - col("a"))
      .withColumn("d", col("__n") - col("__nc") - col("c"))
      .withColumn("score_micro",
        ((round(log10((col("a") * 2 + 1).cast("decimal(38,0)") *
          (col("d") * 2 + 1)), 6).cast("decimal(28,6)") -
          round(log10((col("b") * 2 + 1).cast("decimal(38,0)") *
            (col("c") * 2 + 1)), 6).cast("decimal(28,6)")) *
          lit(1000000)).cast("long"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cls")
          .orderBy(col("score_micro").desc, col("token"))).cast("long"))
      .filter(col("rank") <= topPerClass)
      .select("cls", "token", "a", "score_micro", "rank")
      .orderBy("cls", "rank")
  }
}
