package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark-contamination detection: find training documents that share
 * token n-gram shingles with a held-out/evaluation set — the standard
 * pretraining hygiene step (an eval question leaked into the training
 * corpus inflates benchmark scores without improving the model).
 *
 * Shape at scale: the EVAL side is small by definition (benchmarks are
 * thousands of rows, the corpus is billions), so its exploded shingle
 * set broadcasts; the training corpus explodes to (doc, shingle) and
 * probes the broadcast — per-row scan work, no corpus shuffle for the
 * match itself, one aggregate to count matched shingles per
 * (train_doc, eval_doc) pair. Shingling is the same codegen'd
 * `shingle_set` kernel the dedup family uses (distinct token 3-grams,
 * whole-text fallback under 3 tokens), so "contaminated" here means
 * verbatim n-gram overlap, the strictest and cheapest signal;
 * paraphrase-level leakage is what the embedding similarity join
 * covers.
 */
object ContaminationCheck {

  /**
   * Pairs of (training doc, eval doc) sharing at least `minShingles`
   * distinct shingles, with the overlap count — ranked evidence for a
   * removal/audit pass.
   */
  def ngramOverlap(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      minShingles: Long = 1L): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    def shingles(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        explode(call_function("shingle_set", col(textCol))).as("shingle"))
    val trainSh = shingles(train, "train_id")
    val evalSh = shingles(eval, "eval_id")
    trainSh.join(broadcast(evalSh), "shingle")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
      .filter(col("n_shared_shingles") >= minShingles)
  }

  /**
   * Paraphrase-level (embedding) contamination — the semantic member
   * of the family, catching eval leakage the verbatim n-gram scan
   * cannot (reworded questions, translated passages): training rows
   * whose embedding is cosine-≥ `threshold` close to ANY eval row,
   * each with its closest eval doc as removal/audit evidence.
   *
   * Shape at scale: candidates come from
   * [[SimilarityJoin.lshCosinePairsBetween]], so the corpus is probed
   * only through eval-bucket collisions (the eval side is thousands
   * of rows by definition) — corpus×corpus pairs are never generated
   * and the corpus is never shuffled, the same shape as the
   * incremental semantic gate. The per-doc argmax is one map-side
   * `min_by(eval_id, (−cos_sim, eval_id))` hash aggregate (ties →
   * lowest eval id), never a window sort. At the shipped 6×64 LSH
   * parameters recall is the measured 1 at threshold 0.4, so the
   * driver oracle is the exact quadratic join.
   */
  def semanticOverlap(
      train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String,
      bitsPerTable: Int = 6, nTables: Int = 64,
      threshold: Double = 0.4, scale: Int = 6,
      maxBucket: Option[Int] = None): DataFrame =
    SimilarityJoin.lshCosinePairsBetween(train, eval, idCol, vecCol,
      bitsPerTable, nTables, threshold, seed = 42L, scale = scale,
      maxBucket = maxBucket)
      .groupBy(col("a_id").as("train_id"))
      .agg(
        count(lit(1)).as("n_eval_hits"),
        min_by(col("b_id"), struct(negate(col("cos_sim")), col("b_id")))
          .as("closest_eval_id"),
        max(col("cos_sim")).as("max_cos_sim"))

  /**
   * The release-gate rollup of [[ngramOverlap]]: per training-corpus
   * stratum (source, snapshot, ...), how many documents are
   * contaminated and at what rate — the table a "cleared for
   * training" decision actually reads.
   *
   * Shape at scale: the contaminated-id set (distinct train ids from
   * the overlap join, small by construction — bounded by eval-adjacent
   * docs) rides a broadcast-able left join back onto the train
   * relation; the rollup is one stratum-keyed hash aggregate. The
   * clean majority of the corpus is touched by exactly one scan +
   * probe, never shuffled.
   */
  def overlapBySource(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, stratumCol: String,
      minShingles: Long = 1L): DataFrame = {
    val hits = ngramOverlap(train, eval, idCol, textCol, minShingles)
      .select(col("train_id")).distinct()
      .withColumn("__graft_hit", lit(1L))
    train.select(col(idCol).as("train_id"), col(stratumCol))
      .join(broadcast(hits), Seq("train_id"), "left")
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(coalesce(col("__graft_hit"), lit(0L))).as("n_contaminated"))
      .select(col(stratumCol), col("n_train_docs"),
        col("n_contaminated"),
        round(col("n_contaminated") / col("n_train_docs"), 4)
          .as("contamination_rate"))
  }
}
