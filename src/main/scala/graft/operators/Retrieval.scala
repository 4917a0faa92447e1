package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.tokens

/**
 * Lexical retrieval and rank fusion — the keyword-side complement to
 * the engine's vector search (reference: the search API's embedding
 * top-k, `/root/reference/app.py:113-161`). A RAG data pipeline needs
 * both retrievers plus a fuser; BM25 + reciprocal-rank fusion is the
 * standard public recipe (Robertson & Zaragoza 2009; Cormack et al.
 * SIGIR 2009).
 *
 * Shape at 100 TB: the corpus is scanned twice, both passes cheap and
 * shuffle-light — pass 1 is a scan-local aggregate to ONE row (N,
 * Σdl); pass 2 explodes tokens but filters to the handful of query
 * terms BEFORE anything shuffles, so only matching (doc, term)
 * instances leave the scan. Document frequencies aggregate from the
 * slim per-(doc, term) relation (≤ |terms| rows out) and broadcast
 * back; the final top-k is `TakeOrderedAndProject`, never a global
 * sort. Nothing driver-side except the k-row result boundary.
 */
object Retrieval {

  /** A constant-valued but NON-FOLDABLE partition key for the ≤ k-row
    * post-limit rank windows: `lit(0)` gets stripped by Catalyst's
    * `EliminateWindowPartitions` (foldable keys are dropped), putting
    * the window back on an empty partition spec whose WindowExec
    * warning would mask a REAL unpartitioned window in a bench log.
    * `pmod(xxhash64(x), 1)` is always 0 but no optimizer rule can
    * prove it (unlike the earlier `length(x)·0`, which Catalyst's
    * multiply-by-zero simplification folds whenever the anchor column
    * is non-nullable — true of every in-memory test relation); the
    * hash exchange it adds moves only the ≤ k post-limit rows. */
  private[graft] def singlePartitionKey(anchor: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(anchor), lit(1L))

  /** Per-(doc, term) BM25 contribution, shared verbatim by the single-
    * and batched-query paths so their scores are bit-identical:
    * idf·tfc with the Lucene-smoothed idf and dl/avgdl length norm,
    * rounded to 6 decimals for the exact DECIMAL summation. Expects
    * columns tf, df, dl and the broadcast stats row (__n, __sumdl). */
  private def contrib(k1: Double, b: Double): org.apache.spark.sql.Column = {
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val idf =
      log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfc = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    round(idf * tfc, 6).cast("decimal(28,6)")
  }

  /**
   * Okapi BM25 top-k: score(d) = Σ_t idf(t) · tf·(k1+1) /
   * (tf + k1·(1 − b + b·dl/avgdl)) with the Lucene-style smoothed
   * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (always positive, so
   * matching a ubiquitous term never penalizes).
   *
   * Determinism: each term's contribution is rounded to 6 decimals
   * then summed EXACTLY in DECIMAL (the [[TextAnalysis.tokenLogFreqScore]]
   * convention), so partition/merge order cannot perturb the score;
   * ties break on id. avgdl is derived from an exact integer token-sum
   * in one final division — engines agree bit-for-bit.
   */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    // Pass 1: corpus size + exact token-count sum, one row, broadcast.
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(size(tokens(col(textCol))).cast("long")).as("__sumdl"))
    // Pass 2: per-(doc, term) frequencies for query terms only — the
    // isin filter sits between explode and the aggregate, so the
    // exchange carries |query terms| × matching docs rows, not the
    // corpus's token instances. dl rides the same scan (functionally
    // dependent on the id, so keying by it adds no groups).
    val tf = docs.select(
        col(idCol),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from the slim relation: one row per (doc, term) ⇒ count(*) IS
    // the document frequency. ≤ |query terms| rows — broadcast.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // partitioned by a constant: the window input is the ≤ k post-limit
    // rows, and a non-empty partition spec keeps WindowExec's
    // "No Partition Defined" warning from masking a REAL unpartitioned
    // window elsewhere in a bench log
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("score").desc, col(idCol))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(contrib(k1, b)).as("__s"))
      .select(col(idCol), col("n_terms"), col("__s").cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k) // TakeOrderedAndProject — the window below sorts ≤ k rows
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Query-likelihood retrieval with Dirichlet smoothing (Zhai &
   * Lafferty 2001) — the LM-based classic beside BM25:
   *
   *   score(d, Q) = Σ_{t∈Q} ln( (tf(t,d) + μ·P(t|C)) / (dl + μ) )
   *
   * with P(t|C) = cf(t)/|C| and μ = 2000 (the standard prior).
   * Decomposed for the slim-scan shape: Σ_{t present}
   * [ln(tf + μP) − ln(μP)]  +  Σ_{t∈Q'} ln(μP)  −  |Q'|·ln(dl + μ),
   * where Q' = query terms that occur in the corpus at all (a
   * zero-cf term is undefined under the model; both engines derive
   * Q' from the same cf relation). Only docs containing ≥1 query
   * term are ranked — the inverted-index convention.
   *
   * Determinism: each piece is rounded to 6 decimals at a fixed
   * point (per-term delta, the query constant's per-term logs, the
   * per-doc length term) and combined EXACTLY in DECIMAL — the
   * [[bm25TopK]] discipline, so partition order cannot perturb the
   * score. Same two-pass scan shape as BM25: one exact token-sum
   * row, one explode filtered to the query terms; cf comes from the
   * slim tf relation (every occurrence of a query term is in a
   * matching doc).
   */
  def queryLikelihoodTopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, mu: Double = 2000.0): DataFrame = {
    require(queryTerms.nonEmpty, "query likelihood needs at least one term")
    require(k > 0, s"k must be positive, got $k")
    require(mu > 0, s"mu must be positive, got $mu")
    val stats = docs.agg(
      sum(size(tokens(col(textCol))).cast("long")).as("__sumdl"))
    val tf = docs.select(
        col(idCol),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    def muP = lit(mu) *
      (col("cf").cast("double") / col("__sumdl").cast("double"))
    val qconst = cf.crossJoin(broadcast(stats)).agg(
      count(lit(1)).as("__nq"),
      sum(round(log(muP), 6).cast("decimal(28,6)")).as("__c0"))
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("score").desc, col(idCol))
    tf.join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_terms"),
        sum(round(log(col("tf") + muP) - log(muP), 6)
          .cast("decimal(28,6)")).as("__sd"))
      .crossJoin(broadcast(qconst))
      .select(col(idCol), col("n_terms"),
        (col("__sd") + col("__c0") -
          round(col("__nq").cast("double") *
            log(col("dl").cast("double") + lit(mu)), 6)
            .cast("decimal(28,6)")).cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * RM3 pseudo-relevance feedback model (Lavrenko & Croft 2001;
   * Abdul-Jaleel et al. 2004): run [[queryLikelihoodTopK]], treat its
   * top-`fbDocs` as relevant, estimate the relevance model
   * P(t|R) ∝ Σ_d w_d·tf(t,d)/dl_d with document weights
   * w_d = exp(score_d − max score) (micro-quantized), keep the
   * top-`fbTerms` expansion terms, and interpolate with the original
   * query at λ = 1/2. Everything after the one exp() lives on exact
   * integer grids: per-(t,d) mass `(w_d·tf·10⁶) div dl`, the
   * original-query part `(500000·qtf) div |Q|`, the relevance part
   * `(500000·s_t) div Σs`.
   *
   * @return the interpolated term-weight relation (term, s_micro,
   *         weight_micro, is_original) — the expansion-model card
   */
  def rm3Model(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], fbDocs: Int = 10, fbTerms: Int = 10,
      mu: Double = 2000.0): DataFrame = {
    val spark = docs.sparkSession
    // pass1 is fbDocs rows but a large plan (the whole first-pass
    // ranking); it is referenced twice below (max-score + weights), and
    // everything downstream would re-derive it once per reference —
    // multiplicatively, since those consumers are themselves referenced
    // more than once. Materialize the bounded relation (localCheckpoint:
    // fbDocs rows) so the plan holds a leaf instead of a copy of the
    // ranking subtree.
    val pass1 = queryLikelihoodTopK(docs, idCol, textCol, queryTerms,
      k = fbDocs, mu = mu).localCheckpoint(true)
    val mx = pass1.agg(max(col("score")).as("__ms"))
    val fbw = pass1.crossJoin(broadcast(mx))
      .select(col(idCol),
        floor(exp(col("score") - col("__ms")) * 1000000 + 0.5)
          .cast("long").as("wq"))
    // Join the (broadcast, fbDocs-row) weight relation to the DOCS
    // before tokenizing: the inner join on the id commutes with the
    // explode, so only the feedback documents are ever tokenized —
    // the previous shape exploded the ENTIRE corpus and then dropped
    // every non-feedback row at the join (guide §2.3: project/filter
    // before the fan-out).
    val srel = docs
      .join(broadcast(fbw), idCol.toString :: Nil)
      .select(col(idCol), col("wq"),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("wq"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(sum(expr("(wq * tf * 1000000) div dl")).as("s"))
    // fbTerms rows, referenced twice (Σs + the interpolation join):
    // materialize for the same plan-size reason as pass1.
    val topE = srel.orderBy(col("s").desc, col("term")).limit(fbTerms)
      .localCheckpoint(true)
    val sumS = topE.agg(sum("s").as("__ss"))
    import spark.implicits._
    val orig = queryTerms.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.map { case (t, q) => (t, q) }
      .toDF("term", "qtf")
    val nQ = queryTerms.size
    orig
      .join(topE.crossJoin(broadcast(sumS)), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("s"), lit(0L)).as("s_micro"),
        (coalesce(expr(s"(500000 * qtf) div $nQ"), lit(0L)) +
          coalesce(expr("(500000 * s) div __ss"), lit(0L)))
          .as("weight_micro"),
        col("qtf").isNotNull.as("is_original"))
  }

  /**
   * RM3 second-pass ranking: weighted query-likelihood (the KL
   * ranking) under the [[rm3Model]] term weights. Exact to the last
   * bit: each per-(t,d) log piece is rounded to an integer micro
   * BEFORE multiplying by the micro weight, so every score is a pure
   * BIGINT in 10⁻¹² units (`score_p`) — no float accumulation at
   * all. One extra corpus pass over the (bounded) final term set,
   * joined by term (never an isin over dynamic literals — the term
   * relation stays a broadcast DataFrame, no driver collect).
   */
  def rm3TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, fbDocs: Int = 10,
      fbTerms: Int = 10, mu: Double = 2000.0): DataFrame = {
    val wrel = rm3Model(docs, idCol, textCol, queryTerms, fbDocs, fbTerms, mu)
      .select(col("term"), col("weight_micro").as("w"))
    // 1-row corpus-length stat, referenced twice (c0 + the final
    // score): materialize so the corpus is scanned for it once and the
    // plan holds a leaf, not two copies of the scan.
    val stats = docs.agg(
      sum(size(tokens(col(textCol))).cast("long")).as("__sumdl"))
      .localCheckpoint(true)
    // The second corpus pass, reduced to the query's posting lists
    // (≤ |matched terms| rows per doc). Referenced twice (cf2 + the
    // per-doc score): materialize so the corpus explode+join+aggregate
    // runs once instead of once per reference.
    val tf2 = docs
      .select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .join(broadcast(wrel), "term")
      .groupBy(col(idCol), col("dl"), col("term"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val cf2 = tf2.groupBy("term").agg(sum("tf").as("cf"))
    def muP = lit(mu) *
      (col("cf").cast("double") / col("__sumdl").cast("double"))
    val c0 = cf2.join(broadcast(wrel), "term").crossJoin(broadcast(stats))
      .agg(sum(col("w") *
          round(log(muP) * lit(1e6)).cast("long")).as("__c0w"),
        sum(col("w")).as("__sw"))
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("score_p").desc, col(idCol))
    tf2.join(broadcast(cf2), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("w") *
          round((log(col("tf") + muP) - log(muP)) * lit(1e6)).cast("long"))
          .as("__ps"))
      .crossJoin(broadcast(c0))
      .select(col(idCol), col("n_terms"),
        (col("__ps") + col("__c0w") -
          col("__sw") *
            round(log(col("dl").cast("double") + lit(mu)) * lit(1e6))
              .cast("long")).as("score_p"))
      .orderBy(col("score_p").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Batched BM25: score a SET of queries in ONE corpus pass — the
   * shape that matters at 100 TB, where the scan dominates and Q
   * queries must amortize it (offline retrieval evals, hard-negative
   * mining, RAG batch jobs). Scores are bit-identical to running
   * [[bm25TopK]] per query (same [[contrib]] expression, same DECIMAL
   * summation); only the execution is shared.
   *
   * Shape at scale: the token explode + per-(doc, term) aggregate runs
   * ONCE over the union of all query terms (the same slim subtree
   * feeds df and the scoring branch — ReuseExchange collapses the
   * second scan exactly as in [[TextAnalysis.tfIdfTopTerms]]); the
   * (query, term) map is a broadcast fan-out AFTER the aggregate, so a
   * term shared by q queries replicates slim rows, never token
   * instances. Per-query top-k is the bounded `topk_by_score`
   * aggregate — ≤ k rows per query ride the final exchange, never a
   * window sort over all scored docs.
   *
   * Output: (query_id, `idCol`, score, rnk), k rows per query, ordered
   * by (query_id, rnk). `idCol` values must be long-typed (the
   * `topk_by_score` id contract).
   */
  def bm25BatchTopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs at least one term")
    require(queries.map(_._1).distinct.size == queries.size, "query ids must be unique")
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qt = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(size(tokens(col(textCol))).cast("long")).as("__sumdl"))
    val tf = docs.select(
        col(idCol),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(broadcast(qt), "term") // fan out per query AFTER the slim agg
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(contrib(k1, b)).as("__s"))
      .select(col("query_id"), col(idCol), col("__s").cast("double").as("score"))
      .groupBy("query_id")
      .agg(graft.functions.GraftFunctions.topKByScore(
        col("score"), col(idCol).cast("long"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), col("col.id").as(idCol),
        col("col.score").as("score"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /**
   * Reciprocal-rank fusion of two ranked lists (Cormack et al. 2009):
   * rrf(d) = Σ_lists 1/(rrfK + rank_list(d)), absent ⇒ contributes 0.
   * Both inputs are already k-bounded rank lists (columns `idCol`,
   * `rankCol`), so the fusion is a tiny full-outer join — constant
   * work however large the corpus behind the lists.
   */
  def rrfFuse(
      a: DataFrame, b: DataFrame, idCol: String,
      aRank: String, bRank: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // constant partition for the same reason as bm25TopK's rank window
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("rrf").desc, col(idCol))
    a.join(b, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        coalesce(col(aRank), lit(0L)).as(aRank),
        coalesce(col(bRank), lit(0L)).as(bRank),
        round(
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(aRank)), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(bRank)), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Exact-phrase top-k — the positional capability bag-of-words BM25
   * cannot express ("new york" ≠ "york new"). The phrase test is
   * SCAN-LOCAL: each document's token array is sliced into n-grams
   * and compared in place (codegen array HOFs), so no positional
   * postings ever shuffle — the only exchange is the k-row
   * `TakeOrderedAndProject` boundary. The inverted-index alternative
   * ships per-term position lists through a join; at 100 TB,
   * re-deriving positions from the scan beats shuffling them (the
   * same argument as bm25TopK's filter-before-exchange).
   * Rank: occurrence count desc, then id.
   */
  def phraseTopK(
      docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two tokens")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phrase tokens must be non-empty and space-free: $phrase")
    require(k > 0, s"k must be positive, got $k")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("n_hits").desc, col(idCol))
    // one codegen kernel pass over the text bytes (ring buffer of the
    // last m token spans) — the HOF formulations run interpreted and
    // allocate per position (gram strings: measured 6× slower at
    // sf0.1); the kernel allocates nothing per token
    docs.select(col(idCol),
        graft.functions.GraftFunctions.phraseCount(
          col(textCol), typedLit(phrase)).as("n_hits"))
      .filter(col("n_hits") > 0)
      .orderBy(col("n_hits").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Proximity top-k: documents where `termA` and `termB` co-occur
   * within `window` tokens, ranked by the closest pair (min |i−j|
   * ascending, then id), with the count of within-window pairs
   * carried as evidence. Position lists are per-document arrays
   * computed in the scan (two-arg `transform` exposes the element
   * index); the |pa|·|pb| distance set is bounded by the terms'
   * per-document frequencies, never corpus size, and reduces to two
   * scalars before anything leaves the scan — the same no-postings-
   * shuffle shape as [[phraseTopK]].
   */
  def proximityTopK(
      docs: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, window: Int, k: Int): DataFrame = {
    require(termA != termB, "proximity terms must differ")
    require(window > 0, s"window must be positive, got $window")
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(singlePartitionKey(col(idCol)))
      .orderBy(col("min_dist").asc, col(idCol))
    def positions(term: String) =
      filter(
        transform(col("toks"), (x, i) => when(x === term, i + 1).otherwise(-1)),
        p => p =!= -1)
    docs.select(col(idCol),
        filter(tokens(col(textCol)), t => t =!= "").as("toks"))
      .select(col(idCol),
        flatten(transform(positions(termA),
          i => transform(positions(termB), j => abs(i - j)))).as("dists"))
      .select(col(idCol),
        array_min(col("dists")).cast("long").as("min_dist"),
        size(filter(col("dists"), d => d <= window)).cast("long").as("n_pairs"))
      .filter(col("min_dist") <= window)
      .orderBy(col("min_dist").asc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * pass@k — the unbiased estimator of Chen et al. 2021 ("Evaluating
   * Large Language Models Trained on Code", eq. 1):
   * pass@k = 1 − C(n−c, k)/C(n, k), for a task with `n` samples of
   * which `c` passed. Both binomials reduce to one falling factorial
   * each — Π_{i<k}(n−c−i) / Π_{i<k}(n−i) — built here as an
   * expression PRODUCT LOOP of exact BIGINT factors (k is a plan-time
   * constant; a zero factor lands exactly when n−c < k, collapsing
   * the numerator and making pass@k = 1 with no special case), then
   * ONE double division. NULL when k > n (the estimator is undefined;
   * a 0/0 would otherwise surface as NaN). Cross-engine exact: every
   * engine multiplies the same integers and divides once.
   */
  def passAtK(n: Column, c: Column, k: Int, scale: Int = 6): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    def falling(base: Column): Column =
      (0 until k).map(i => base - lit(i.toLong)).reduce(_ * _)
    when(n >= k,
      round(lit(1.0) -
        falling(n - c).cast("double") / falling(n).cast("double"), scale))
  }

  /**
   * Mean-reciprocal-rank card (the ranking-eval staple beside
   * [[ndcgCard]]) over a MULTI-QUERY ranked relation: per query the
   * reciprocal rank of its FIRST relevant hit within the top k
   * (`rr_micro = 10⁶ div first_rel_rank`, 0 when nothing relevant
   * lands in the top k), then the mean over the WHOLE query batch —
   * `nQueries` is a parameter, not `count(distinct queryCol)`, so
   * queries whose rank list is entirely irrelevant (or empty) still
   * weigh the denominator down, which is what MRR means.
   *
   * All-integer on the micro grid (each 1/r quantizes to `10⁶ div r`
   * BEFORE the sum — both engines divide identically), so the card is
   * bitwise-reproducible; the ±1µ-per-query quantization is noise at
   * eval scale and documented here.
   *
   * Shape at 100 TB: the input is already k·|Q| rows (the ranking
   * upstream did the corpus work — [[bm25BatchTopK]] amortizes ONE
   * scan over the batch); this card is one hash aggregate to |Q| rows
   * and one 1-row reduction.
   *
   * Output: one row (n_queries, n_answered, sum_rr_micro, mrr_micro).
   */
  def mrrCard(
      ranked: DataFrame, queryCol: String, rnkCol: String, relCol: String,
      k: Int, nQueries: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nQueries >= 1, s"nQueries must be >= 1, got $nQueries")
    ranked
      .groupBy(col(queryCol))
      .agg(min(when(col(relCol) && col(rnkCol) <= k, col(rnkCol)))
        .as("first_rel"))
      .agg(
        sum(when(col("first_rel").isNotNull, 1L).otherwise(0L))
          .as("n_answered"),
        sum(coalesce(expr("1000000L div first_rel"), lit(0L)))
          .as("sum_rr_micro"))
      .select(
        lit(nQueries).as("n_queries"),
        coalesce(col("n_answered"), lit(0L)).as("n_answered"),
        coalesce(col("sum_rr_micro"), lit(0L)).as("sum_rr_micro"))
      .withColumn("mrr_micro", expr(s"sum_rr_micro div ${nQueries}L"))
  }

  /**
   * Kendall τ agreement between two top-k rankings of the same corpus
   * — the ranker-agreement card (BM25 vs QL, old index vs new): over
   * the items BOTH rankers surfaced, count concordant vs discordant
   * pairs; ranks within a list are unique (`row_number`), so there are
   * no ties and τ = τ-a = (C − D) / (m(m−1)/2). Items only one ranker
   * surfaced are reported in the n_a/n_b/n_common columns rather than
   * folded into τ (the conventions that impute ranks for them disagree
   * with each other; the card keeps the well-defined part exact).
   *
   * Shape: both inputs are k-bounded rank lists, so the pair join is
   * ≤ k² rows — a broadcast nested-loop over bounded relations,
   * constant work at any corpus size (the [[rrfFuse]] contract). C
   * and D are exact integers; τ leaves the grid once, as one rounded
   * double division (identical sequence in the oracle).
   *
   * Output: one row (n_a, n_b, n_common, concordant, discordant, tau).
   */
  def kendallTau(
      a: DataFrame, b: DataFrame, idCol: String, rnkCol: String): DataFrame = {
    // Materialize the two k-bounded lists ONCE: the card references
    // each input four times (pair join sides + count columns), and
    // without the pin the upstream ranking pipelines (corpus scan,
    // aggregate, top-k) would re-execute per reference — only their
    // exchanges are reusable. A k-row local checkpoint is the
    // bounded-list analogue of the rrfFuse constant-work contract.
    val ar = a.select(col(idCol).cast("long").as("__id"),
      col(rnkCol).cast("long").as("__ra")).localCheckpoint(true)
    val br = b.select(col(idCol).cast("long").as("__id"),
      col(rnkCol).cast("long").as("__rb")).localCheckpoint(true)
    val common = ar.join(br, "__id").localCheckpoint(true)
    val x = common.select(col("__id").as("__idx"),
      col("__ra").as("__rax"), col("__rb").as("__rbx"))
    val y = common.select(col("__id").as("__idy"),
      col("__ra").as("__ray"), col("__rb").as("__rby"))
    val cd = x.join(broadcast(y), col("__idx") < col("__idy"))
      .agg(
        coalesce(sum(when((col("__rax") < col("__ray")) ===
          (col("__rbx") < col("__rby")), 1L).otherwise(0L)), lit(0L))
          .as("concordant"),
        coalesce(sum(when((col("__rax") < col("__ray")) =!=
          (col("__rbx") < col("__rby")), 1L).otherwise(0L)), lit(0L))
          .as("discordant"))
    ar.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(br.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(common.agg(count(lit(1)).as("n_common"))))
      .crossJoin(broadcast(cd))
      .withColumn("tau",
        when(col("n_common") >= 2,
          round((col("concordant") - col("discordant")).cast("double") /
            (col("n_common").cast("double") * (col("n_common") - 1) /
              lit(2.0)), 6))
          .otherwise(lit(0.0)))
  }

  /**
   * Mean-average-precision card — the third batch ranking staple
   * beside [[mrrCard]] and [[ndcgCard]]: per query, average precision
   * AP@k = (Σ over relevant ranks r ≤ k of precision@r) / min(R_q, k),
   * where R_q is the query's CORPUS relevant count (`relTotals`), so
   * relevant docs the ranking missed entirely still divide the score
   * down; MAP is the mean over the whole `nQueries` batch.
   *
   * Integer micro grid throughout: precision@r quantizes as
   * `(10⁶·c_r) div r` (c_r = relevant count among the top r) BEFORE
   * the sum, the per-query AP as one more integral division, the mean
   * as a third — both engines floor identically, so the card is
   * bitwise-reproducible (±1µ per division, documented here).
   *
   * Shape at 100 TB: input is the k·|Q|-row ranked relation; the
   * cumulative count is a window over k-BOUNDED per-query partitions
   * (never corpus-sized), then two hash aggregates. `relTotals`
   * (query_id, n_rel_corpus) is |Q| rows, broadcast.
   *
   * Output: one row (n_queries, sum_ap_micro, map_micro).
   */
  def mapCard(
      ranked: DataFrame, queryCol: String, rnkCol: String, relCol: String,
      k: Int, relTotals: DataFrame, nQueries: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nQueries >= 1, s"nQueries must be >= 1, got $nQueries")
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rnkCol))
    val ap = ranked
      .filter(col(rnkCol) <= k)
      .withColumn("__c",
        sum(when(col(relCol), 1L).otherwise(0L)).over(w))
      .filter(col(relCol))
      .withColumn("__prec_micro", expr(s"(1000000 * __c) div $rnkCol"))
      .groupBy(col(queryCol).as("__q"))
      .agg(sum("__prec_micro").as("__ap_num"))
      .join(relTotals.select(col(queryCol).as("__q"),
        col("n_rel_corpus")), Seq("__q"), "right")
      .select(
        when(col("n_rel_corpus") > 0,
          expr(s"coalesce(__ap_num, 0L) div least(n_rel_corpus, ${k}L)"))
          .otherwise(0L).as("__ap_micro"))
    ap.agg(coalesce(sum("__ap_micro"), lit(0L)).as("sum_ap_micro"))
      .select(lit(nQueries).as("n_queries"), col("sum_ap_micro"))
      .withColumn("map_micro", expr(s"sum_ap_micro div ${nQueries}L"))
  }

  /** Largest rank the nDCG gain table covers. */
  val MaxNdcgRank = 100

  /**
   * Per-rank DCG gain in micro-units: `round(10^6 / log2(r + 1))` for
   * r = 1..[[MaxNdcgRank]]. The irrational `log2` runs ONCE here in
   * the JVM; engine and SQL oracle then share the exact same integer
   * literals — the [[graft.operators.HyperLogLog.LinearCountingTable]]
   * discipline applied to ranking metrics, which is what makes nDCG
   * bitwise-reproducible across engines.
   */
  val DcgGainMicro: Array[Long] =
    Array.tabulate(MaxNdcgRank)(i =>
      math.round(1e6 / (math.log(i + 2) / math.log(2))))

  /** Ideal-DCG prefix sums: entry i (1-based) = DCG of i relevant
    * docs in the top i ranks. */
  val DcgPrefixMicro: Array[Long] =
    DcgGainMicro.scanLeft(0L)(_ + _).tail

  /**
   * nDCG@k card (Järvelin & Kekäläinen 2002, binary relevance) over
   * an already-ranked result list: `dcg_micro` sums the gain-table
   * entry at each relevant rank ≤ k, `idcg_micro` is the prefix-sum
   * entry at `min(k, n_rel_corpus)` (the ideal ranking puts every
   * relevant doc first), and `ndcg_milli = (1000·dcg) div idcg` — all
   * BIGINT, zero when the corpus has no relevant docs.
   *
   * Shape: one aggregate over the k-row ranked relation plus a 1-row
   * broadcast of the corpus relevant-count — nothing corpus-sized
   * moves here (the ranking upstream already did that work).
   *
   * @param ranked   result list with rank and relevance columns
   * @param totalRel 1-row relation with column `n_rel_corpus`
   */
  def ndcgCard(
      ranked: DataFrame, rnkCol: String, relCol: String, k: Int,
      totalRel: DataFrame): DataFrame = {
    require(k >= 1 && k <= MaxNdcgRank,
      s"k must be in [1, $MaxNdcgRank], got $k")
    val gains = typedLit(DcgGainMicro.toSeq)
    val prefix = typedLit(DcgPrefixMicro.toSeq)
    val dcg = ranked.agg(
      coalesce(sum(when(col(relCol) && col(rnkCol) <= k,
        element_at(gains, col(rnkCol).cast("int"))).otherwise(0L)),
        lit(0L)).as("dcg_micro"))
    dcg.crossJoin(broadcast(totalRel))
      .withColumn("idcg_micro",
        when(col("n_rel_corpus") > 0,
          element_at(prefix,
            least(col("n_rel_corpus"), lit(k.toLong)).cast("int")))
          .otherwise(0L))
      .select(
        col("n_rel_corpus").cast("long").as("n_rel_corpus"),
        col("dcg_micro").cast("long").as("dcg_micro"),
        col("idcg_micro").cast("long").as("idcg_micro"),
        when(col("idcg_micro") > 0,
          expr("(1000 * dcg_micro) div idcg_micro"))
          .otherwise(0L).as("ndcg_milli"))
  }

  /**
   * Postings-at-rest census: the per-term statistics an inverted
   * index stores — document frequency, collection frequency, doc-id
   * range and the largest doc-id GAP (the quantity delta-encoded
   * postings compression lives on: max_gap bounds the bit width a
   * block needs). Top-k terms by df (ties: term asc) — the head of
   * the vocabulary, where postings engineering matters.
   *
   * Shape at 100 TB: the (term, doc) relation aggregates scan-locally
   * (map-side combine on the explode), gaps come from a lag window
   * PARTITIONED BY TERM (each term's postings sort independently —
   * no global order), and the final top-k is TakeOrderedAndProject.
   */
  def postingsStats(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val posting = docs
      .select(col(idCol).cast("long").as("doc"),
        explode(filter(tokens(col(textCol)), t => t =!= "")).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("term").orderBy("doc")
    val rw = Window.partitionBy(singlePartitionKey(col("term")))
      .orderBy(col("df").desc, col("term"))
    posting
      .withColumn("gap", col("doc") - coalesce(lag("doc", 1).over(w), col("doc")))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        min("doc").as("first_doc"), max("doc").as("last_doc"),
        max("gap").as("max_gap"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)
      .withColumn("rnk", row_number().over(rw).cast("long"))
  }

  /**
   * Rank-biased overlap at depth k (Webber, Moffat & Zobel, TOIS
   * 2010): RBO@k = (1−p)·Σ_{d=1..k} p^(d−1)·X_d/d, where X_d is the
   * size of the two rankings' intersection at depth d — THE standard
   * top-weighted similarity between two rankings (compare a new
   * retriever against the incumbent, lexical vs vector lists, index
   * builds before/after a change). p = 0.9 weights the top ~10.
   *
   * Inputs are two k-bounded rank lists (queryCol, idCol, rank).
   * Determinism: X_d are integers from an equality join; each p^(d−1)
   * is a LEFT-CHAINED product of the literal (the engines multiply
   * the same doubles in the same order — the lsh_calibration
   * convention, no pow()); each term is nano-quantized via
   * floor(x·10⁹ + 0.5) on a bit-identical double, so the per-query
   * SUM is an exact integer and aggregation order cannot perturb it.
   * Queries with no overlap emit rbo = 0, not a missing row.
   *
   * Shape at scale: everything is k-bounded per query — the join, the
   * d-grid explode (≤ k² rows per query), the aggregate. Output:
   * (queryCol, n_common, rbo).
   */
  def rankBiasedOverlap(
      a: DataFrame, b: DataFrame, queryCol: String, idCol: String,
      aRank: String, bRank: String, k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p in (0,1), got $p")
    val pw = Array.iterate(1.0, k)(_ * p) // p^0 .. p^(k-1), chained
    val joined = a.join(b, Seq(queryCol, idCol))
      .select(col(queryCol),
        greatest(col(aRank), col(bRank)).cast("long").as("m"))
      .filter(col("m") <= k)
      .groupBy(col(queryCol), col("m")).agg(count(lit(1)).as("c"))
    val pwOf = (2 to k).foldLeft(when(col("d") === 1, lit(pw(0)))) {
      (acc, d) => acc.when(col("d") === d, lit(pw(d - 1)))
    }
    val agg = joined
      .select(col(queryCol),
        explode(sequence(col("m").cast("int"), lit(k))).as("d"), col("c"))
      .groupBy(col(queryCol), col("d")).agg(sum("c").as("x"))
      .select(col(queryCol), col("d"),
        when(col("d") === k, col("x")).otherwise(0L).as("xk"),
        floor(pwOf * col("x") / col("d") * lit(1e9) + lit(0.5))
          .cast("long").as("term_nano"))
      .groupBy(col(queryCol))
      .agg(sum("xk").as("n_common"), sum("term_nano").as("__s"))
    a.select(col(queryCol)).distinct()
      .join(agg, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(
          round(lit(1.0 - p) * (col("__s").cast("double") / lit(1e9)), 6),
          lit(0.0)).as("rbo"))
  }

  /** Cosine at the repo's 6-decimal score convention: float-promoted
    * double accumulation in element order (the [[graft.functions
    * .VectorKernels.cosineSimilarity]] arithmetic) then the exact
    * binary-value HALF_UP round Spark's `round(_, 6)` applies — so a
    * driver-side replica and the codegen expression agree bit-for-bit.
    * Zero-norm inputs score 0. */
  private[operators] def cosRound6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
   * SIGIR 1998): greedily pick k results maximizing
   * λ·rel(i) − (1−λ)·max_{j∈picked} sim(i, j) — the diversity pass a
   * RAG pipeline runs AFTER retrieval so the k passages aren't k
   * near-copies of the best hit.
   *
   * Input is the per-query CANDIDATE relation (groupCol, idCol,
   * vecCol, relCol with 6-dp cosine relevances) — already k-bounded
   * by the upstream top-k, which is the scale contract: the greedy
   * selection is genuinely sequential (pick r depends on picks
   * 1..r−1), so it runs per group over that bounded pool via typed
   * flatMapGroups — O(k·pool) work and O(pool) state per query,
   * constant in corpus size; this is the documented last-resort tier
   * (a sequential algorithm no relational composition expresses).
   *
   * Determinism: rel and sim are 6-dp doubles; each MMR score is one
   * multiply-subtract on them (bit-identical IEEE in any engine —
   * 1−λ is COMPUTED, never a second literal); ties break on least id.
   * The first pick's max-sim term is 0.0, so pick 1 is argmax rel.
   * Output: (groupCol, rnk, idCol, rel, max_sim, mmr_score), k rows
   * per group (fewer when the pool is smaller).
   */
  def mmrRerank(
      candidates: DataFrame, groupCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val w2 = 1.0 - lambda
    candidates
      .select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"), col(vecCol).cast("array<float>"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val cand = it.toArray.sortBy(c => (c._2, c._3))
        val picked = Array.newBuilder[(Long, Long, Long, Double, Double, Double)]
        val chosenVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        val used = new Array[Boolean](cand.length)
        var r = 1
        while (r <= math.min(k, cand.length)) {
          var bestI = -1
          var bestMmr = Double.NegativeInfinity
          var bestMax = 0.0
          var i = 0
          while (i < cand.length) {
            if (!used(i)) {
              // true max over picked sims (can be negative); only the
              // empty set pins to 0.0
              var maxSim =
                if (chosenVecs.isEmpty) 0.0 else Double.NegativeInfinity
              chosenVecs.foreach { v =>
                val s = cosRound6(cand(i)._4, v)
                if (s > maxSim) maxSim = s
              }
              val mmr = lambda * cand(i)._3 - w2 * maxSim
              // strict >: equal scores keep the earlier (least-id)
              // candidate — cand is sorted by id
              if (mmr > bestMmr) { bestI = i; bestMmr = mmr; bestMax = maxSim }
            }
            i += 1
          }
          used(bestI) = true
          chosenVecs += cand(bestI)._4
          picked += ((g, r.toLong, cand(bestI)._2, cand(bestI)._3,
            bestMax, bestMmr))
          r += 1
        }
        picked.result().iterator
      }
      .toDF(groupCol, "rnk", idCol, "rel", "max_sim", "mmr_score")
  }

  /**
   * Late-interaction (multi-vector) retrieval — ColBERT-style maxsim
   * (Khattab & Zaharia, SIGIR 2020): a query is a BAG of token
   * vectors, a document a bag of token vectors, and the score is
   *
   *   maxsim(q, d) = Σ_{t ∈ q} max_{v ∈ d} cos(t, v)
   *
   * — the token-level scoring every other retrieval row here (and the
   * reference's single-embedding store, app.py:218-222) cannot
   * express: a document matches when EACH query token finds its own
   * best-matching document token, not when one pooled vector does.
   *
   * This is the EXACT variant — the reranker/baseline contract: the
   * query-token relation is bounded (a query batch is at most
   * thousands of token vectors) and broadcast; the corpus-token
   * relation streams through ONE scan against it. The score matrix
   * collapses in two map-side-combinable hash aggregates — per
   * (query, query-token, doc) max, then per (query, doc) sum — and
   * the final top-k is the k-slot `topk_by_score`
   * TypedImperativeAggregate: no window, no global sort, nothing
   * driver-side but the k·|queries| result. The broadcast
   * nested-loop join is deliberate and bounded by construction
   * (tokens-per-query-batch × corpus tokens, the same shape as the
   * NaiveBayes broadcast predict join); for UNBOUNDED query sets use
   * [[maxSimTopKLsh]], whose candidate generation buckets instead of
   * broadcasting.
   *
   * Determinism: cosines are `scale`-rounded then lifted to exact
   * integer micros, so the per-token max and the cross-token sum are
   * partition-order independent; ranking ties break on least doc id.
   *
   * @param queryTokens (qidCol, qtokCol, vecCol) — one row per query
   *                    token; qtok ids unique across the relation
   * @param docTokens   (didCol, vecCol) — one row per document token
   * @return (qidCol, didCol, maxsim_micro, rnk) — top `k` docs per
   *         query by (maxsim desc, doc id asc), rnk in 1..k
   */
  def maxSimTopK(
      queryTokens: DataFrame, qidCol: String, qtokCol: String,
      docTokens: DataFrame, didCol: String, vecCol: String,
      k: Int, scale: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = queryTokens.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val qt = queryTokens.select(col(qidCol).cast("long").as("__qid"),
      col(qtokCol).cast("long").as("__qtok"), col(vecCol).as("__qv"))
    val dt = docTokens.select(col(didCol).cast("long").as("__did"),
      col(vecCol).as("__dv"))
    val sim = dt.crossJoin(broadcast(qt))
      .select(col("__qid"), col("__qtok"), col("__did"),
        round(round(graft.functions.GraftFunctions
          .knnCosineSimilarity(col("__qv"), col("__dv")), scale) *
          math.pow(10.0, scale)).cast("long").as("__sim_micro"))
    maxSimAggregate(sim, k)
      .select(col("__qid").as(qidCol), col("__did").as(didCol),
        col("maxsim_micro"), col("rnk"))
  }

  /**
   * The LSH-bucketed maxsim — the 100 TB path for UNBOUNDED query
   * sets, where broadcasting the query tokens is off the table: each
   * query token generates its top-`candidatesPerToken` candidate DOC
   * TOKENS through [[SimilarityJoin.knnBetween]]'s banded-LSH
   * machinery (bucketed equality joins, viral-bucket caps — never
   * all-pairs), and the same two hash aggregates score only the
   * candidate pairs. A (query token, doc) pair outside the candidate
   * set contributes 0 — the standard late-interaction approximation,
   * whose recall against [[maxSimTopK]] is pinned as a grid in
   * `MaxSimSpec`: recall grows with the candidate budget and reaches
   * 1 at the shipped point on the fixture corpus.
   *
   * The pinned metric is deliberately TOP-K DOC RECALL, not score
   * equality, and this path deliberately has no exact-oracle driver
   * row (probed in r15: scores diverge at sf0.01 under any candidate
   * budget): banded LSH finds HIGH-cosine pairs with probability ~1,
   * but a maxsim score also sums per-token maxima at middling
   * cosine, whose bucket-collision probability is genuinely below 1
   * — and sub-threshold best tokens truncate to 0 where the exact
   * sum goes negative. Score-exact late interaction is
   * [[maxSimTopK]]'s contract; this path's contract is retrieving
   * the same documents cheaply.
   *
   * @param docTokens (didCol, dtokCol, vecCol) — dtok ids unique
   *                  across the relation and disjoint from qtok ids
   */
  def maxSimTopKLsh(
      queryTokens: DataFrame, qidCol: String, qtokCol: String,
      docTokens: DataFrame, didCol: String, dtokCol: String,
      vecCol: String, k: Int, candidatesPerToken: Int = 32,
      bitsPerTable: Int = 4, nTables: Int = 64,
      threshold: Double = 0.0, seed: Long = 42L, scale: Int = 6,
      maxBucket: Option[Int] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(candidatesPerToken >= 1,
      s"candidatesPerToken must be >= 1, got $candidatesPerToken")
    val q = queryTokens.select(col(qtokCol).cast("long").as("__tid"),
      col(vecCol).as("__tv"))
    val c = docTokens.select(col(dtokCol).cast("long").as("__tid"),
      col(vecCol).as("__tv"))
    val cands = SimilarityJoin.knnBetween(q, c, "__tid", "__tv",
      k = candidatesPerToken, bitsPerTable = bitsPerTable,
      nTables = nTables, threshold = threshold, seed = seed,
      scale = scale, maxBucket = maxBucket)
    val sim = cands
      .join(docTokens.select(col(dtokCol).cast("long").as("corpus_id"),
        col(didCol).cast("long").as("__did")), "corpus_id")
      .join(broadcast(queryTokens.select(
        col(qtokCol).cast("long").as("query_id"),
        col(qidCol).cast("long").as("__qid"))), "query_id")
      .select(col("__qid"), col("query_id").as("__qtok"), col("__did"),
        round(col("cos_sim") * math.pow(10.0, scale)).cast("long")
          .as("__sim_micro"))
    maxSimAggregate(sim, k)
      .select(col("__qid").as(qidCol), col("__did").as(didCol),
        col("maxsim_micro"), col("rnk"))
  }

  /**
   * Late interaction AT REST — maxsim over the IVF-partitioned
   * multi-vector store (the shape a production ColBERT deployment
   * runs): the doc TOKEN vectors live in an [[IvfIndex]] store
   * written `partitionBy(cluster_id)`, each query token routes to its
   * `searchTopSize` nearest centroids (the reference's
   * `KMeansTreeSearchTopSize` knob, /root/reference/app.py:60, applied
   * per token), and the maxsim reduction runs over only the probed
   * clusters. A (query token, doc token) pair outside the token's
   * probe set contributes nothing — the same approximation contract
   * as [[maxSimTopKLsh]], with the SAME exactness escape hatch as
   * every IVF row: `searchTopSize >= numClusters` degenerates to the
   * exact [[maxSimTopK]] bit-for-bit (recall under real pruning is
   * pinned as a breadth grid in `MaxSimSpec`).
   *
   * Shape at 100 TB: routing is driver-side against the k×dim
   * centroid matrix (the query batch is BOUNDED — the same contract
   * under which [[maxSimTopK]] broadcasts it; collecting it here is
   * explicit model-boundary state, not data); the store scan prunes
   * to the UNION of probed partitions at file-listing time; the
   * probe relation (one row per token × probed cluster) broadcasts,
   * so each stored token fans out only to the query tokens that
   * probed ITS cluster; then two map-side hash aggregates and the
   * k-slot top-k — no window, no global sort, no all-pairs.
   */
  def maxSimTopKIndexed(
      queryTokens: DataFrame, qidCol: String, qtokCol: String,
      store: DataFrame, model: IvfIndex.IvfModel,
      didCol: String, vecCol: String, k: Int, searchTopSize: Int,
      scale: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(searchTopSize > 0,
      s"searchTopSize must be positive, got $searchTopSize")
    val spark = queryTokens.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // Null, null-casting, or null-ELEMENT token vectors cannot route
    // and are dropped here, mirroring maxSimTopK where null sims fall
    // out of the max aggregate — the filter runs on the CAST column so
    // an array<string> that casts its elements to null is caught too;
    // without it getSeq(2).toArray would NPE on the driver.
    val qRows = queryTokens
      .select(col(qidCol).cast("long"), col(qtokCol).cast("long"),
        col(vecCol).cast("array<float>").as("__qv"))
      .filter(col("__qv").isNotNull &&
        !expr("exists(__qv, x -> x IS NULL)"))
      .collect()
    val probes: Seq[(Long, Long, Seq[Float], Int)] = qRows.toSeq.flatMap { r =>
      val v = r.getSeq[Float](2)
      model.rankClusters(v.toArray, SearchStrategy.CosineSimilarity)
        .take(searchTopSize)
        .map(c => (r.getLong(0), r.getLong(1), v, c))
    }
    val probeDf = probes.toDF("__qid", "__qtok", "__qv", IvfIndex.ClusterCol)
    val probedClusters = probes.map(_._4).distinct
    val pruned = store.filter(col(IvfIndex.ClusterCol)
      .isin(probedClusters.map(Integer.valueOf): _*))
    val sim = pruned
      .select(col(didCol).cast("long").as("__did"), col(vecCol).as("__dv"),
        col(IvfIndex.ClusterCol))
      .join(broadcast(probeDf), IvfIndex.ClusterCol)
      .select(col("__qid"), col("__qtok"), col("__did"),
        round(round(graft.functions.GraftFunctions
          .knnCosineSimilarity(col("__qv"), col("__dv")), scale) *
          math.pow(10.0, scale)).cast("long").as("__sim_micro"))
    maxSimAggregate(sim, k)
      .select(col("__qid").as(qidCol), col("__did").as(didCol),
        col("maxsim_micro"), col("rnk"))
  }

  /** Shared maxsim reduction: (__qid, __qtok, __did, __sim_micro) →
    * per-token max → per-doc sum → k-slot top-k per query. */
  private def maxSimAggregate(sim: DataFrame, k: Int): DataFrame =
    sim
      .groupBy("__qid", "__qtok", "__did")
      .agg(max("__sim_micro").as("__tok_max"))
      .groupBy("__qid", "__did")
      .agg(sum("__tok_max").as("__maxsim"))
      .groupBy("__qid")
      .agg(graft.functions.GraftFunctions.topKByScore(
        col("__maxsim").cast("double"), col("__did"), k).as("__top"))
      .select(col("__qid"), posexplode(col("__top")))
      .select(col("__qid"), col("col.id").as("__did"),
        col("col.score").cast("long").as("maxsim_micro"),
        (col("pos") + 1).cast("long").as("rnk"))
}
