package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection for LM pretraining — DSIR (Data Selection with
 * Importance Resampling, Xie et al. 2023): score every document in a
 * RAW pool by how much more likely its hashed-n-gram bag is under a
 * TARGET corpus' distribution than under the raw pool's own, then
 * keep the top of the ranking. This is the published recipe behind
 * "select web data that looks like Wikipedia/books": cheap bag-of-
 * hashed-n-grams multinomials stand in for real LMs, and the log
 * importance weight is a single sparse dot product per document.
 *
 *   features(d)  = unigrams(d) ++ bigrams(d), each hashed into one of
 *                  B buckets (md5 → first 4 nibbles → mod B)
 *   log w(d)     = Σ_ng [ log p̂_tgt(b(ng)) − log p̂_raw(b(ng)) ]
 *   p̂_c(b)       = (cnt_c[b] + 1) / (N_c + B)   (add-one smoothing)
 *
 * Engine-portable exactness, the package discipline: the only
 * transcendental is log10 of an INTEGER count, rounded to 6 dp before
 * it enters arithmetic (the [[TextAnalysis]] logfreq convention), and
 * every sum over those 6-dp values runs in DECIMAL(28,6) — so the
 * weight is bit-identical under any partitioning and replayable by a
 * SQL oracle. The normalizer term is constant per n-gram and is
 * applied once as `n_ngrams · offset` instead of per feature.
 *
 * Scale shape (the reason DSIR beats classifier-based selection at
 * 100 TB): the per-bucket count table is B rows (1024 here — a
 * BROADCAST, not a model), built by ONE map-side-combinable aggregate
 * over the exploded n-gram relation; scoring is explode → broadcast
 * hash join → per-doc hash aggregate. No shuffle ever carries more
 * than (doc_id, bucket) pairs, and the driver holds nothing.
 */
object DataSelection {

  /** round-to-6dp log10 of (count + `plus`), as exact DECIMAL — the
    * one place a transcendental enters; 6-dp rounding of a log of an
    * integer makes both engines agree bit-for-bit. */
  private def dlog(cnt: Column, plus: Long): Column =
    round(log10(cnt + lit(plus)), 6).cast("decimal(28,6)")

  /**
   * Per-document DSIR log importance weights for the raw (non-target)
   * pool. `isTarget` marks the rows whose n-gram distribution defines
   * the target; every other row is scored.
   *
   * @return (idCol, n_ngrams, logweight) for raw docs — logweight
   *         rounded to 6 dp, higher = more target-like. Deterministic
   *         ranking ties resolve by id downstream.
   */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && 65536 % buckets == 0,
      s"buckets must divide 16^4 for an unbiased md5-nibble bucket " +
        s"(got $buckets)")
    // ONE pass over the n-gram explode, reduced immediately to
    // (doc, bucket) multiplicities — BOTH downstream consumers (the
    // bucket multinomials and the per-doc scoring join) read this
    // same aggregate, so the plan carries one ReusedExchange instead
    // of scanning/exploding the corpus twice, and the scoring join's
    // input is doc × distinct-buckets rows, not one row per n-gram.
    // N-gram generation + hashing is the codegen
    // `hashed_ngram_buckets` kernel (round-13 profile, SCALING.md:
    // the split/transform/concat HOF pipeline was a CodegenFallback
    // and 69% of the operator's cost; the kernel digests byte slices
    // of the text and explodes INTs, never an n-gram string).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val docBuckets = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        explode(graft.functions.GraftFunctions
          .hashedNgramBuckets(col(textCol), buckets)).as("__b"))
      .groupBy(col("__id"), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val counts = docBuckets.groupBy("__b").agg(
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__ct"),
      sum(when(col("__tgt"), 0L).otherwise(col("__c"))).as("__cq"))
    val lam = counts.select(col("__b"),
      (dlog(col("__ct"), 1L) - dlog(col("__cq"), 1L)).as("__lam"))
    // smoothing normalizer: log10(N_tgt + B) − log10(N_raw + B),
    // constant per n-gram — one row, broadcast.
    val off = counts.agg(
      (dlog(sum("__ct"), buckets.toLong) -
        dlog(sum("__cq"), buckets.toLong)).as("__off"))
    docBuckets.filter(!col("__tgt"))
      .join(broadcast(lam), "__b")
      .groupBy(col("__id").as(idCol))
      .agg(sum("__c").as("n_ngrams"),
        sum(col("__lam") * col("__c")).as("__s"))
      .crossJoin(broadcast(off))
      .select(col(idCol), col("n_ngrams"),
        round((col("__s") - col("n_ngrams") * col("__off"))
          .cast("double"), 6).as("logweight"))
  }

  /**
   * DSIR selection card: the top-`k` raw documents by importance
   * weight (ties by id — a total order), i.e. the documents that the
   * resampling step keeps with the highest probability. One
   * `TakeOrderedAndProject` over [[dsirWeights]] — k rows to the
   * driver, never a global sort.
   */
  def dsirSelect(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      k: Int, buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    dsirWeights(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("logweight").desc, col(idCol))
      .limit(k)
  }
}
