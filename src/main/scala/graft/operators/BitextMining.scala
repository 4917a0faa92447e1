package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix /
 * LASER recipe) — the operator that turns two monolingual corpora
 * plus a multilingual embedding into TRANSLATION PAIRS, the training
 * data of every MT and multilingual-LLM objective. Raw cosine is a
 * broken mining criterion (hub vectors are near everything); the
 * margin normalizes each pair's cosine by what "near" MEANS for x and
 * y — the mean similarity of their k nearest neighbors:
 *
 *   margin(x, y) = cos(x, y) / ((meanNN_k(x) + meanNN_k(y)) / 2)
 *
 * A pair is MINED when it is mutual-best under the margin and clears
 * a threshold — hubs fail (their meanNN is as high as any single
 * cosine), genuine translations pass.
 *
 * Determinism discipline: cosines are micro-quantized ONCE
 * (floor(cos·1e6 + 0.5), a BIGINT) and every downstream step — top-k
 * neighbor sets (ties by id), integral means, the margin ratio
 * (×2e6, integral division), best-pair selection (max margin, least
 * partner id) — is integer arithmetic on that grid, so the mined set
 * is bit-identical under any partitioning and replayable by a SQL
 * oracle. Negative-cosine candidates are dropped up front (they are
 * never translations, and non-negativity makes truncating and
 * flooring division agree across engines).
 *
 * Scale shape: this operator scores CANDIDATE PAIRS — it does not
 * choose them. At fixture scale the driver row feeds the brute-force
 * cross product (broadcast of the smaller language, scan-local
 * kernels); at 100 TB candidates come from the ANN index family
 * (IVF/LSH top-k per source vector), which bounds the pair relation
 * at |corpus|·k rows. Inside: two PARTITIONED windows (per x, per y
 * — bounded by the per-vector candidate count, never a global sort)
 * and hash aggregates; the margin join ships three BIGINTs per
 * candidate.
 */
object BitextMining {

  /**
   * Scale-path candidate generation: the two-relation banded LSH
   * join, micro-quantized. Candidates are (x, y) rows sharing any
   * hyperplane-LSH bucket — each side is keyed once with the same
   * seeds, the join is a plain bucket-equality shuffle join, and
   * corpus × corpus pairs NEVER materialize (the [[marginPairs]]
   * scaladoc's "candidates come from the ANN family" path, made
   * concrete). `maxBucket` drops viral buckets, bounding any bucket's
   * contribution at capL × capR; `thresholdMicro` is the candidate
   * floor and is PART OF THE ROW'S SEMANTICS — the margin neighborhood
   * means range over candidates with cos_micro >= thresholdMicro,
   * exactly the ANN-top-candidates recipe of Artetxe & Schwenk §3.2
   * (neighborhoods come from the retrieved candidate set, not the full
   * corpus). At recall-1 LSH parameters the candidate set equals the
   * exact threshold relation, which is how the driver oracle replays
   * it with a plain cross join + WHERE.
   *
   * @return (x_id, y_id, cos_micro) with cos_micro =
   *         floor(cos·1e6 + 0.5) >= thresholdMicro
   */
  def candidatesBetween(
      left: DataFrame, right: DataFrame, idCol: String, vecCol: String,
      thresholdMicro: Long,
      bitsPerTable: Int = 3, nTables: Int = 64, seed: Long = 42L,
      maxBucket: Option[Int] = None): DataFrame = {
    require(thresholdMicro > 0,
      s"candidate floor must be positive (got $thresholdMicro): the " +
        "margin is only defined on positive-cosine candidates")
    graft.functions.GraftFunctions.register(left.sparkSession)
    def keyed(df: DataFrame) = Dedup.capBuckets(
      df.select(
        col(idCol).as("id"),
        explode(graft.functions.GraftFunctions.cosineLshKeys(
          col(vecCol), bitsPerTable, nTables, seed)).as("bkt")),
      Seq("bkt"), maxBucket)
    val cands = keyed(left).alias("a")
      .join(keyed(right).alias("b"), col("a.bkt") === col("b.bkt"))
      .select(col("a.id").as("x_id"), col("b.id").as("y_id"))
      .dropDuplicates("x_id", "y_id")
    val lv = left.select(col(idCol).as("id"), col(vecCol).as("v"))
    val rv = right.select(col(idCol).as("id"), col(vecCol).as("v"))
    cands
      .join(lv.as("va"), col("x_id") === col("va.id"))
      .join(rv.as("vb"), col("y_id") === col("vb.id"))
      .select(col("x_id"), col("y_id"),
        floor(graft.functions.GraftFunctions.knnCosineSimilarity(
          col("va.v"), col("vb.v")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= thresholdMicro)
  }

  /** Score candidate pairs and pick each side's best partner.
    *
    * @param cands (xCol, yCol, cosMicroCol) candidate relation —
    *              cosMicro = floor(cos·1e6 + 0.5) as BIGINT
    * @param k     neighborhood size for the margin denominator
    * @param thresholdMicro mined when margin_micro > this (margin
    *              ×1e6; 1_050_000 = the literature's ~1.05)
    * @return one row per x with a positive-cosine candidate:
    *         (x, best y, cos_micro, margin_micro, mutual, is_mined)
    */
  def marginPairs(
      cands: DataFrame, xCol: String, yCol: String, cosMicroCol: String,
      k: Int = 4, thresholdMicro: Long = 1050000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // materialized once: three consumers (both neighborhood means and
    // the margin join) would otherwise re-derive the candidate
    // cosines — at ANN-candidate scale that is the expensive part
    val pos = cands.select(
      col(xCol).as("x_id"), col(yCol).as("y_id"),
      col(cosMicroCol).as("cos_micro"))
      .filter(col("cos_micro") > 0)
      .localCheckpoint(true)

    def meanNn(keyCol: String, otherCol: String, as: String) = {
      val w = Window.partitionBy(keyCol)
        .orderBy(col("cos_micro").desc, col(otherCol))
      pos.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(col(keyCol))
        .agg(expr("sum(cos_micro) div count(1)").as(as))
    }
    val mx = meanNn("x_id", "y_id", "mnn_x")
    val my = meanNn("y_id", "x_id", "mnn_y")

    val scored = pos
      .join(mx, "x_id").join(my, "y_id")
      .filter(col("mnn_x") + col("mnn_y") > 0)
      .withColumn("margin_micro",
        expr("(cos_micro * 2000000) div (mnn_x + mnn_y)"))
      .localCheckpoint(true) // read twice (best-per-x, best-per-y)

    // best partner per side: max margin, least partner id on ties —
    // min_by over struct(-margin, partner) keeps it one hash
    // aggregate and works for ANY orderable partner-id type (string
    // ids, Long.MinValue): only margin_micro is negated, and that
    // column is the operator's own BIGINT on the micro grid
    val bestX = scored.groupBy("x_id").agg(
      min_by(struct(col("y_id"), col("cos_micro"), col("margin_micro")),
        struct((-col("margin_micro")).as("nm"), col("y_id"))).as("b"))
      .select(col("x_id"), col("b.y_id").as("y_id"),
        col("b.cos_micro").as("cos_micro"),
        col("b.margin_micro").as("margin_micro"))
    val bestY = scored.groupBy("y_id").agg(
      min_by(col("x_id"),
        struct((-col("margin_micro")).as("nm"), col("x_id"))).as("x_id"))
      .select(col("y_id"), col("x_id"))

    bestX
      .join(bestY.withColumn("__mutual", lit(true)), Seq("x_id", "y_id"), "left")
      .select(col("x_id"), col("y_id"), col("cos_micro"), col("margin_micro"),
        coalesce(col("__mutual"), lit(false)).as("mutual"),
        (coalesce(col("__mutual"), lit(false)) &&
          col("margin_micro") > thresholdMicro).as("is_mined"))
  }
}
