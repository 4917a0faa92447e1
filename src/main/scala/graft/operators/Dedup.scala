package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines — beyond-reference
 * scope (the reference is read-only single-query, SURVEY.md §2.2).
 *
 * Scale design notes (the part that matters at 100 TB):
 *  - Exact dedup is a hash aggregate / window on a fingerprint — one
 *    shuffle on the fingerprint key, map-side partial aggregation, no
 *    row ever compared to more than its own group.
 *  - Near-dup detection NEVER does an all-pairs join. Candidate pairs
 *    come only from equality joins on derived keys (LSH band buckets,
 *    prefix blocks, SimHash values) — each is a standard shuffled hash /
 *    sort-merge join on a key, which Spark distributes and AQE
 *    skew-splits. Exact verification (Jaccard) runs only on candidates.
 *  - Known skew hazard: a viral duplicate (one fingerprint with millions
 *    of rows) makes a quadratic bucket. The `maxBucket` parameter on the
 *    pair generators is the guardrail: blocks holding more than
 *    `maxBucket` rows are dropped wholesale BEFORE the self-join, so no
 *    bucket ever contributes more than maxBucket²/2 candidate pairs. A
 *    block that big is a viral/boilerplate cluster that exact dedup (one
 *    hash aggregate) handles for free — near-dup pairing inside it is
 *    quadratic waste. AQE skew-join handles residual shuffle skew below
 *    the cap.
 */
object Dedup {

  /**
   * Viral-key guardrail shared by the candidate generators: drop rows
   * whose block key holds more than `cap` rows. Implemented as a
   * count aggregate (map-side partials) filtered to the OVERSIZED keys
   * — a relation bounded by n/cap rows and near-empty on organic data
   * — broadcast into a left-anti join on the block key. Measured ~2×
   * cheaper than the window-count formulation (which shuffles AND
   * sorts the full keyed relation): the keyed rows are never sorted,
   * and the anti join folds into the same stage as the downstream
   * bucket self-join's exchange.
   */
  def capBuckets(
      df: DataFrame, keyCols: Seq[String], cap: Option[Int]): DataFrame =
    cap.fold(df) { c =>
      require(c > 0, s"maxBucket must be positive, got $c")
      val viral = df.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__graft_bucket_n"))
        .filter(col("__graft_bucket_n") > c)
        .select(keyCols.map(col): _*)
      df.join(broadcast(viral), keyCols, "left_anti")
    }

  /**
   * Exact-duplicate groups by a fingerprint key: one row per distinct
   * key with its duplicate count and the kept (minimum) id.
   */
  def exactGroups(docs: DataFrame, idCol: String, key: Column): DataFrame =
    docs.groupBy(key.as("fp"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keep_id"))

  /** Keep-first exact dedup: the surviving rows themselves (row_number
    * over the fingerprint partition — one shuffle on the key). */
  def dedupKeepFirst(docs: DataFrame, idCol: String, key: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct-token set of a whitespace-tokenized text column. */
  private def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /**
   * Distinct token-3-gram shingle set — exactly the shingling
   * [[graft.functions.TextHashKernels.minhashSignature]] hashes (short
   * docs fall back to one whole-text shingle). Shingles are
   * order-sensitive, which is what makes them the right near-dup signal
   * when documents share a vocabulary but not an order. Kernel-backed
   * expression: stays inside WholeStageCodegen (a higher-order-function
   * formulation is interpreted per shingle).
   */
  private[operators] def shingleSet(text: Column): Column =
    org.apache.spark.sql.functions.call_function("shingle_set", text)

  /** Exact Jaccard similarity of two set-valued columns. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /**
   * Blocked n-gram Jaccard near-dup pairs: candidates are pairs sharing
   * a text-prefix block key; each candidate pair is verified with exact
   * token-set Jaccard. Deterministic and oracle-expressible — the
   * blocking join is an equality join, never a cross join.
   */
  def blockedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockLen: Int,
      threshold: Double,
      scale: Int = 6,
      maxBucket: Option[Int] = None): DataFrame = {
    val base = capBuckets(docs.select(
      col(idCol).as("id"),
      substring(col(textCol), 1, blockLen).as("bk"),
      tokenSet(col(textCol)).as("toks")), Seq("bk"), maxBucket)
    val a = base.alias("a")
    val b = base.alias("b")
    a.join(b, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("a_id"),
        col("b.id").as("b_id"),
        round(jaccard(col("a.toks"), col("b.toks")), scale).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Shingle-containment pairs (Broder 1997's asymmetric resemblance
   * companion): C(A→B) = |S(A) ∩ S(B)| / |S(A)| over token-3-gram
   * shingle sets — the QUOTE/SUBSET detector Jaccard structurally
   * misses (a 50-shingle doc fully quoted inside a 5000-shingle doc
   * has J ≈ 0.01 but C(A→B) = 1). The training-data use is
   * boilerplate/quotation mining: high-containment pairs are
   * wrapper-page duplicates and embedded licenses, not topical
   * neighbors.
   *
   * The metric runs over INFORMATIVE shingles only: a shingle in more
   * than `maxDf` documents is a stop-shingle (boilerplate is exactly
   * what a hot shingle is) and is excluded from both numerator and
   * denominator — the TF-IDF stopword convention, stated in the
   * contract rather than hidden in a candidate cap. That definition
   * is what makes the card array-free and linear: one inverted index
   * of the capped postings (64-bit xxhash64 keys on the shuffle, never
   * shingle strings — a collision can only nudge a df count at 2⁻⁶⁴),
   * one equality self-join whose volume is Σ_s df_s² with df ≤ maxDf
   * BY CONSTRUCTION, one pair-count aggregate, and a broadcast join
   * of the per-doc informative-shingle counts. No per-pair array
   * intersection anywhere (the array formulation measured 10 s at
   * sf0.1 against ~1 s for this shape — 300k candidate pairs each
   * rebuilding a hash set of ~50 strings).
   *
   * Output: (a_id, b_id, n_a, n_b, overlap, cont_a_micro,
   * cont_b_micro) ordered by (a_id, b_id); n_x = |informative
   * shingles of x|, cont_x = 10⁶·overlap div n_x, exact integers.
   */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      thresholdMicro: Long, maxDf: Int = 1024): DataFrame = {
    require(thresholdMicro >= 1 && thresholdMicro <= 1000000L,
      s"thresholdMicro must be in [1, 1e6], got $thresholdMicro")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    GraftFunctions.register(docs.sparkSession)
    val posts = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(shingleSet(col(textCol))).as("__s0"))
      .select(col("id"), xxhash64(col("__s0")).as("s"))
    val rare = posts.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("s")
    val informative = posts.join(rare, "s").localCheckpoint(true)
    val nRel = informative.groupBy("id").agg(count(lit(1)).as("n"))
    val ov = informative.select(col("s"), col("id").as("a_id"))
      .join(informative.select(col("s"), col("id").as("b_id")), "s")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("overlap"))
    // nRel is |docs|-sized — an id-equality join, NOT a broadcast
    // hint: AQE broadcasts it when it is small and shuffles when a
    // 100 TB corpus makes it large
    ov
      .join(nRel.select(col("id").as("a_id"), col("n").as("n_a")), "a_id")
      .join(nRel.select(col("id").as("b_id"), col("n").as("n_b")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
        col("overlap"),
        expr("(1000000 * overlap) div n_a").as("cont_a_micro"),
        expr("(1000000 * overlap) div n_b").as("cont_b_micro"))
      .filter(greatest(col("cont_a_micro"), col("cont_b_micro"))
        >= thresholdMicro)
      .orderBy("a_id", "b_id")
  }

  /**
   * LSH parameter calibration card — "would our dedup knobs actually
   * catch the near-dups this corpus has?": for each VERIFIED near-dup
   * pair (exact Jaccard s), the probability the configured MinHash
   * LSH (bands b × rowsPerBand r) detects it, 1 - (1 - s^r)^b. The
   * powers are fixed chains of IEEE multiplications over the
   * micro-quantized Jaccard — `pow` is libm-specific across engines,
   * a multiply chain is bit-identical — so the card is exact and
   * SQL-replayable. Pairs with detect_prob well under 1 are the
   * S-curve's blind spot: either raise bands or accept the misses,
   * but now it is a number, not folklore.
   */
  def lshCalibration(
      docs: DataFrame, idCol: String, textCol: String,
      blockLen: Int, threshold: Double,
      bands: Int, rowsPerBand: Int, scale: Int = 6): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1, "bands/rows must be >= 1")
    val pairs = blockedJaccardPairs(docs, idCol, textCol, blockLen,
      threshold, scale)
    val jm = floor(col("jaccard") * lit(1000000.0) + lit(0.5)).cast("long")
    val p = col("jacc_micro").cast("double") / lit(1000000.0)
    val sr = (1 to rowsPerBand).map(_ => p).reduce(_ * _)
    val m1 = lit(1.0) - sr
    pairs
      .withColumn("jacc_micro", jm)
      .withColumn("__m1", m1)
      .withColumn("detect_prob",
        round(lit(1.0) -
          (1 to bands).map(_ => col("__m1")).reduce(_ * _), scale))
      .select(col("a_id"), col("b_id"), col("jacc_micro"),
        col("detect_prob"))
  }

  /**
   * MinHash + LSH near-dup pairs (the scale path for unknown-block
   * near-dups): signature → band buckets → equality join within buckets
   * → exact Jaccard verification of the candidates only.
   *
   * With `numHashes = bands * rowsPerBand`, a pair with shingle-set
   * Jaccard s collides in at least one band with probability
   * 1-(1-s^r)^b — the standard S-curve; defaults (8 bands × 4 rows) put
   * the knee near s ≈ 0.5. The verification metric is the SAME metric
   * the signature estimates — Jaccard over token-3-gram shingle sets —
   * so the reported `jaccard` column is exact, not an estimate.
   */
  def minHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      scale: Int = 6,
      maxBucket: Option[Int] = None): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // One row per (doc, band): band key = per-band fold of the MinHash
    // signature, computed in ONE kernel pass per row
    // (graft.functions.TextHashKernels.minhashBandHashes — banding via
    // higher-order lambdas would interpret, and re-evaluate, the
    // signature once per band). The banded relation is deliberately slim
    // (id, band, bh): shingle sets are NOT carried through the band-join
    // shuffle.
    val bandHashes = org.apache.spark.sql.functions.call_function(
      "minhash_band_hashes", col(textCol), lit(bands), lit(rowsPerBand))
    val banded = capBuckets(
      docs.select(col(idCol).as("id"), posexplode(bandHashes))
        .select(col("id"), col("pos").as("band"), col("col").as("bh")),
      Seq("band", "bh"), maxBucket)
    val a = banded.alias("a")
    val b = banded.alias("b")
    // A pair colliding in several bands appears once per collision —
    // dedupe the slim (a_id, b_id) pairs BEFORE attaching shingle sets
    // for verification (arrays join in only against unique candidates).
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val toks = docs.select(col(idCol).as("id"), shingleSet(col(textCol)).as("toks"))
    candidates
      .join(toks.as("ta"), col("a_id") === col("ta.id"))
      .join(toks.as("tb"), col("b_id") === col("tb.id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("ta.toks"), col("tb.toks")), scale).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * SimHash near-dup groups: documents sharing an identical 64-bit
   * SimHash are near-certain near-dups (Hamming distance 0). A banded
   * Hamming-ball search (split the 64 bits into 4 × 16-bit keys; equal
   * in ≥1 band ⇒ Hamming ≤ 48 candidate) is the standard extension —
   * here we surface the exact-collision groups, which is the common
   * "cheap pass" before MinHash.
   */
  /**
   * Byte-payload dedup via content-defined chunking: each payload is
   * split at Gear-rolling-hash boundaries (shift-tolerant, unlike fixed
   * blocks) and fingerprinted per chunk; chunks appearing in more than
   * one payload are the dedup-able storage. One explode + one hash
   * aggregate — scales like word-count.
   */
  def chunkDedupStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      avgBits: Int = 5): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        explode(GraftFunctions.contentChunkHashes(col(payloadCol), avgBits)).as("chunk"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("id")).as("n_docs"),
        min(col("id")).as("first_id"))
      .filter(col("n_copies") > 1)
  }

  /**
   * Incremental dedup: rows of `batch` whose fingerprint does not
   * appear in `seen` (the historical corpus). The production shape for
   * continuous ingestion at 100 TB: the historical side is reduced to a
   * fingerprint-only relation (one slim column through the join), the
   * anti join deduplicates build-side keys map-side, and yesterday's
   * output can be persisted as the next run's `seen` — the corpus is
   * never re-scanned.
   */
  def incrementalNew(
      batch: DataFrame, seen: DataFrame,
      idCol: String, key: Column, seenKey: Column): DataFrame =
    batch.withColumn("__graft_fp", key)
      .join(seen.select(seenKey.as("__graft_fp")), Seq("__graft_fp"), "left_anti")
      .drop("__graft_fp")

  /**
   * Duplicated-span REMOVAL — the rewrite half of [[duplicateNgramStats]]
   * (Lee et al. remove the duplicated substring, not the document):
   * every token covered by at least one cross-document duplicated
   * n-gram is cut, and the document is reassembled from the surviving
   * tokens in order. Exact copies collapse to empty text; a page
   * embedding one viral paragraph keeps everything else.
   *
   * Shape at scale, three explode passes with different fan-outs:
   *  1. gram instances (the detection pass — identical shuffle shape to
   *     [[duplicateNgramStats]], frequency branch sharing the exchange
   *     via the same reuse-preserving conjunct);
   *  2. coverage fan-out `sequence(s, s+n-1)` over DUPLICATED gram
   *     starts only — near-empty on organic corpora, bounded by
   *     n × duplicated-instances on crawls;
   *  3. token reassembly: `posexplode` → anti join on covered
   *     (doc, pos) → per-doc ordered re-concatenation
   *     (`array_sort(collect_list(struct(pos, token)))` — an
   *     ObjectHashAggregate; rewriting text is inherently
   *     string-heavy, and the aggregate buffers exactly one document).
   *
   * Reassembly normalizes token separators to single spaces (the
   * tokenizer's inverse), matching the whitespace-tokenized corpus
   * convention used across the text operators.
   */
  def removeDuplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = split(col(textCol), " ")
    val base = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), toks.as("__toks"))
    val grams = base
      .filter(size(col("__toks")) >= n)
      .select(col("id"),
        explode(sequence(lit(0), size(col("__toks")) - n)).as("__s"),
        col("__toks"))
      .select(col("id"), col("__s"),
        xxhash64(concat_ws(" ", slice(col("__toks"), col("__s") + 1, lit(n)))).as("gh"))
    val perDoc = grams.groupBy("id", "gh").agg(count(lit(1)).as("cnt"))
    val dup = perDoc.groupBy("gh")
      .agg(count(lit(1)).as("__n_docs"), sum(col("cnt")).as("__inst"))
      .filter(col("__n_docs") >= minDocs && col("__inst") >= minDocs)
      .select(col("gh"))
    val covered = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("id"), explode(sequence(col("__s"), col("__s") + (n - 1))).as("pos"))
      .distinct()
    val tokens = base.select(col("id"),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val kept = tokens.join(covered, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(count(lit(1)).as("__n_kept"),
        array_sort(collect_list(struct(col("pos"), col("tok")))).as("__arr"))
      .select(col("id"), col("__n_kept"),
        concat_ws(" ", transform(col("__arr"), x => x.getField("tok"))).as("text_clean"))
    // Output domain matches the rebuild domain: null-id rows are
    // excluded on BOTH sides (they were never rebuilt, so starting
    // from all `docs` would surface them as "fully removed"), and a
    // null text counts 0 tokens rather than the legacy size(null)=-1
    // sentinel corrupting n_removed.
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(toks).cast("long")).as("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /**
   * Incremental SEMANTIC dedup — the embedding counterpart of
   * [[incrementalNew]]: rows of `batch` with no near-duplicate
   * (cosine ≥ threshold) in the historical corpus survive. Candidates
   * come from [[SimilarityJoin.lshCosinePairsBetween]], so the corpus
   * is probed only through batch-bucket collisions — corpus × corpus
   * pairs are never generated, and at 100 TB the corpus side
   * contributes just its (persisted) band-key relation plus the
   * vectors of colliding candidates. One left-anti join on the slim
   * matched-id set finishes the gate.
   */
  def incrementalSemanticNew(
      batch: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      bitsPerTable: Int = 4, nTables: Int = 64, threshold: Double = 0.4,
      seed: Long = 42L, maxBucket: Option[Int] = None): DataFrame = {
    val matched = SimilarityJoin.lshCosinePairsBetween(
        batch, corpus, idCol, vecCol, bitsPerTable, nTables, threshold,
        seed, maxBucket = maxBucket)
      .select(col("a_id").as(idCol))
      .distinct()
    batch.join(matched, Seq(idCol), "left_anti")
  }

  /**
   * SemDeDup-style per-row dedup verdict from a near-dup pair graph:
   * transitive closure of `pairs` (connected components), then every
   * row of the corpus is labeled with its cluster representative
   * (minimum reachable id; singletons represent themselves) and
   * whether it is the kept copy. Composes with ANY pair source —
   * embedding-cosine LSH for semantic dedup, MinHash for lexical.
   * Scale shape = the pair source's (bucketed equality joins) plus
   * O(cluster-diameter) label-propagation rounds, plus one left join
   * of the slim (id, component) relation back onto the corpus.
   */
  def semanticKeepVerdict(rows: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val comps = ConnectedComponents.components(pairs, aCol, bCol)
    rows.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("kept_id"),
        (coalesce(col("component"), col("id")) === col("id")).as("is_kept"))
  }

  /**
   * Quality-aware cluster representative selection: like
   * [[semanticKeepVerdict]], but the kept member of each near-dup
   * cluster is the one with the HIGHEST `score` (ties → lowest id)
   * instead of the lowest id. This is the production form of near-dup
   * resolution — when a crawl holds five variants of a page, keep the
   * most complete one (score = length, quality classifier output,
   * freshness...), not whichever happened to have the smallest id.
   *
   * Shape at scale: component labels from the pair graph (pointer
   * doubling, O(log d) rounds), then ONE hash aggregate picks each
   * cluster's argmax via `min_by(id, (-score, id))` — map-side
   * partials, no window over members, no per-cluster sort — and a
   * broadcast-able join-back stamps the verdict on every row.
   * Singleton rows never enter the aggregate's shuffle (they join to
   * no component and keep themselves).
   */
  def keepBestVerdict(rows: DataFrame, idCol: String, score: Column,
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id")
      : DataFrame = {
    val comps = ConnectedComponents.components(pairs, aCol, bCol)
    val scored = rows.select(col(idCol).as("id"), score.as("__graft_score"))
      .join(comps, Seq("id"), "left")
    val clustered = scored.filter(col("component").isNotNull)
    // min_by on (-score, id) ≡ argmax score, ties → lowest id — and
    // unlike `max_by(id, (score, -id))` it never negates the id, so
    // string doc ids order correctly instead of casting to NULL and
    // making ties non-deterministic. Only the score (numeric by
    // contract) is negated.
    val best = clustered.groupBy("component")
      .agg(min_by(col("id"),
        struct(negate(col("__graft_score")), col("id"))).as("kept_id"))
    clustered.join(best, Seq("component"))
      .select(col("id"), col("kept_id"),
        (col("id") === col("kept_id")).as("is_kept"))
      .unionAll(scored.filter(col("component").isNull)
        .select(col("id"), col("id").as("kept_id"),
          lit(true).as("is_kept")))
  }

  /**
   * Cross-document duplicated-span scan — the token-n-gram formulation
   * of substring deduplication (Lee et al., "Deduplicating Training
   * Data Makes Language Models Better"): for every document, what
   * fraction of its token n-gram instances also occurs in at least
   * `minDocs` distinct documents? Exact duplicates score 1.0; documents
   * quoting a viral passage score the passage's share; clean documents
   * score ~0. The fraction is the standard gate for span-level dedup
   * (drop or trim documents above a threshold), and unlike MinHash it
   * catches PARTIAL overlap — a page that embeds one copied paragraph
   * in original text.
   *
   * Shape at scale: explode n-gram start positions inside the scan
   * stage → hash the gram to a 64-bit key (`xxhash64`, codegen'd — the
   * shuffle carries 8-byte keys, never gram text) → one shuffle to
   * per-(doc, gram) counts → gram document frequency as a hash
   * AGGREGATE over that slim relation (map-side partials, so a viral
   * gram — boilerplate shared by millions of documents — is combined
   * per task and never lands on one reducer; a `count() OVER
   * (PARTITION BY gram)` window would put all of a viral gram's rows
   * in one un-splittable window partition) → the ≥ minDocs grams
   * joined back (AQE picks broadcast when the duplicated-gram set is
   * small, a shuffled hash join on the 8-byte key when a crawl makes
   * it large) → one per-doc aggregate. The corpus is scanned and
   * exploded exactly ONCE:
   * the frequency branch consumes the per-(doc, gram) aggregate
   * INCLUDING its count column, keeping its exchange canonically
   * identical to the probe branch's so ReuseExchange fires (verified
   * on the final adaptive plan; a count-only branch gets rewritten
   * distinct-style by column pruning and silently re-explodes). No
   * all-pairs anywhere. Documents shorter than `n` tokens have no
   * n-grams and report 0/0 → 0.0 via the corpus left join (they never
   * vanish from the output).
   */
  def duplicateNgramStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2,
      scale: Int = 6): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = split(col(textCol), " ")
    // The explicit isNotNull mirrors what the final left join pushes
    // into the probe branch anyway — stating it HERE puts the same
    // filter in the frequency branch too (where the join's version
    // cannot descend past the gram-level aggregate), keeping both
    // branches' scans canonically identical for ReuseExchange.
    // start positions 0 .. n_tokens - n (empty when n_tokens < n)
    val grams = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("id"),
        explode(sequence(lit(0), size(col("__toks")) - n)).as("__s"),
        col("__toks"))
      .select(col("id"),
        xxhash64(concat_ws(" ", slice(col("__toks"), col("__s") + 1, lit(n)))).as("gh"))
    val perDoc = grams.groupBy("id", "gh").agg(count(lit(1)).as("cnt"))
    // One row per (doc, gram) above ⇒ count(*) per gram = document
    // frequency. The instance-sum conjunct is REDUNDANT (sum(cnt) ≥
    // n_docs always) — it is there so this branch consumes `cnt`,
    // which keeps the shared exchange canonically identical to the
    // probe branch's and ReuseExchange running the explode pass once;
    // without it, pruning rewrites this aggregate distinct-style and
    // the plan silently re-explodes the corpus.
    val dup = perDoc.groupBy("gh")
      .agg(count(lit(1)).as("__n_docs"), sum(col("cnt")).as("__inst"))
      .filter(col("__n_docs") >= minDocs && col("__inst") >= minDocs)
      .select(col("gh"), lit(1).as("__dup"))
    // Join strategy is left to AQE: the duplicated-gram relation is
    // near-empty on organic corpora (runtime broadcast) but can be
    // genuinely large on a crawl, where the shuffled hash join on the
    // 8-byte key is the right plan — a forced broadcast would be a
    // driver OOM hazard.
    val agg = perDoc.join(dup, Seq("gh"), "left")
      .groupBy("id")
      .agg(
        sum(col("cnt")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("cnt")).otherwise(0L)).as("dup_grams"))
    docs.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, 0.0)
          .otherwise(round(col("dup_grams").cast("double") / col("n_grams"), scale))
          .as("dup_frac"))
  }

  /**
   * Hamming near-pairs over any 64-bit fingerprint column — the
   * Manku-Jain-Das Sarma (WWW 2007) block-permutation scheme that
   * upgrades fingerprint dedup from exact-equality to near-match:
   * split the 64 bits into `nBlocks` contiguous blocks; by pigeonhole,
   * two hashes within Hamming distance < `nBlocks` agree on at least
   * one whole block, so candidates are (block index, block value)
   * equality-join collisions — never all pairs — and the exact
   * `bit_count(xor)` verifies each candidate in the same codegen
   * stage. With `maxHamming ≤ nBlocks - 1` recall is 1 BY
   * CONSTRUCTION (not measured), so the driver oracle is the exact
   * all-pairs Hamming join. Works for any 64-bit fingerprint: text
   * SimHash, image aHash, audio/video fingerprints, sign-bit
   * sketches. `maxBucket` caps viral block values ([[capBuckets]]).
   *
   * Output: (a_id, b_id, hamming), a_id < b_id.
   */
  def hammingNearPairs(
      rows: DataFrame, idCol: String, hashCol: String,
      nBlocks: Int = 4, maxHamming: Int = 3,
      maxBucket: Option[Int] = None,
      bits: Int = 64): DataFrame = {
    // `bits` = the fingerprint's actual width: for sub-64-bit hashes
    // (48-bit image aHash), blocking the full 64 bits would make the
    // constant-zero top block a universal collision key — all pairs.
    require(bits > 0 && bits <= 64, s"bits must be 1..64: $bits")
    require(nBlocks > 0 && bits % nBlocks == 0,
      s"nBlocks must divide bits=$bits: $nBlocks")
    require(maxHamming >= 0 && maxHamming < nBlocks,
      s"pigeonhole guarantee needs maxHamming < nBlocks: $maxHamming/$nBlocks")
    val keyed = capBuckets(
      rows.select(col(idCol).as("id"), col(hashCol).as("h"),
        explode(array(hammingNarrowKeys(col(hashCol), nBlocks, bits): _*)).as("bk")),
      Seq("bk"), maxBucket)
    keyed.alias("a").join(keyed.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        call_function("bit_count",
          col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
  }

  /**
   * Crawl-scale variant of [[hammingNearPairs]]: multi-block keys.
   *
   * The single-block scheme's keys are `bits / nBlocks` wide — 16 bits
   * at the 4-block default — so at crawl scale RANDOM fingerprints
   * collide on a block with p ≈ n/2^16 per block value and the
   * candidate stage drifts quadratic. The fix (named in Manku et al.
   * WWW'07 §3: increase blocks, require agreement on combinations):
   * split into `nBlocks` blocks; a pair within Hamming distance
   * `maxHamming` flips bits in at most `maxHamming` blocks, so it
   * agrees on EVERY block of some (nBlocks − maxHamming)-subset —
   * enumerate all C(nBlocks, nBlocks − maxHamming) subsets as tables
   * whose key packs the subset's block values into one Long. Key
   * width grows from bits/nBlocks to bits·(1 − maxHamming/nBlocks):
   * the 6-block/Hamming-3 default joins a 64-bit fingerprint on
   * ~32-bit keys (20 tables) instead of 16-bit keys (4 tables) —
   * random collisions per key drop from n/2^16 to n/2^32, the
   * difference between "melts at 10^8 rows" and "fine at 10^10"
   * (measured: `graft.tools.HammingBlockProbe`, table in SCALING.md).
   * Recall is still 1 BY CONSTRUCTION (pigeonhole), so the driver
   * oracle stays the exact all-pairs Hamming join. The trade is
   * shuffle volume: n·C(b, b−k) slim keyed rows vs n·b — bounded and
   * linear, the right side of the trade once random block collisions
   * stop being rare.
   *
   * Output: (a_id, b_id, hamming), a_id < b_id — identical contract
   * to [[hammingNearPairs]].
   */
  def hammingNearPairsWide(
      rows: DataFrame, idCol: String, hashCol: String,
      nBlocks: Int = 6, maxHamming: Int = 3,
      maxBucket: Option[Int] = None,
      bits: Int = 64): DataFrame = {
    require(bits > 0 && bits <= 64, s"bits must be 1..64: $bits")
    require(maxHamming >= 0 && maxHamming < nBlocks,
      s"pigeonhole guarantee needs maxHamming < nBlocks: $maxHamming/$nBlocks")
    require(nBlocks <= bits, s"nBlocks must be <= bits=$bits: $nBlocks")
    val keyed = capBuckets(
      rows.select(col(idCol).as("id"), col(hashCol).as("h"),
        explode(array(
          hammingWideKeys(col(hashCol), nBlocks, maxHamming, bits): _*)).as("bk")),
      Seq("bk"), maxBucket)
    keyed.alias("a").join(keyed.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        call_function("bit_count",
          col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
  }

  /** The single-block join keys of [[hammingNearPairs]]: one
    * struct(blk, key) per contiguous block. Exposed within the package
    * so the measurement probe (`graft.tools.HammingBlockProbe`) counts
    * candidates over EXACTLY the operator's keys. */
  private[graft] def hammingNarrowKeys(
      hash: Column, nBlocks: Int, bits: Int): Seq[Column] = {
    val w = bits / nBlocks
    val mask = if (w == 64) -1L else (1L << w) - 1L
    (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        (shiftright(hash, b * w).bitwiseAND(lit(mask))).as("key"))
    }
  }

  /** The multi-block join keys of [[hammingNearPairsWide]]: one
    * struct(blk, key) per (nBlocks − maxHamming)-subset of block
    * indices, the subset's block values packed into a single Long
    * (total width ≤ bits ≤ 64 since the blocks are disjoint). Block i
    * covers bit range [lo(i), lo(i+1)); widths differ by at most 1,
    * so `bits` need not divide `nBlocks`. */
  private[graft] def hammingWideKeys(
      hash: Column, nBlocks: Int, maxHamming: Int, bits: Int): Seq[Column] = {
    val keep = nBlocks - maxHamming
    val combos = (0 until nBlocks).combinations(keep).toSeq
    require(combos.size <= 64,
      s"C($nBlocks, $keep) = ${combos.size} tables — too many; lower nBlocks")
    def lo(i: Int): Int = i * bits / nBlocks
    def blockVal(i: Int): Column = {
      val w = lo(i + 1) - lo(i)
      val mask = if (w == 64) -1L else (1L << w) - 1L
      shiftright(hash, lo(i)).bitwiseAND(lit(mask))
    }
    combos.zipWithIndex.map { case (combo, t) =>
      val packed = combo.foldLeft((lit(0L), 0)) { case ((acc, shift), i) =>
        (acc.bitwiseOR(shiftleft(blockVal(i), shift)),
          shift + (lo(i + 1) - lo(i)))
      }._1
      struct(lit(t).as("blk"), packed.as("key"))
    }
  }

  def simhashGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"), GraftFunctions.simhash64(col(textCol)).as("sh"))
      .groupBy("sh")
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keep_id"))
      .filter(col("n_docs") > 1)
  }
}
