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
    // max(struct(margin, -partner)) keeps it one hash aggregate
    val bestX = scored.groupBy("x_id").agg(
      max(struct(col("margin_micro"), (-col("y_id")).as("ny"),
        col("y_id"), col("cos_micro"))).as("b"))
      .select(col("x_id"), col("b.y_id").as("y_id"),
        col("b.cos_micro").as("cos_micro"),
        col("b.margin_micro").as("margin_micro"))
    val bestY = scored.groupBy("y_id").agg(
      max(struct(col("margin_micro"), (-col("x_id")).as("nx"),
        col("x_id"))).as("b"))
      .select(col("y_id"), col("b.x_id").as("x_id"))

    bestX
      .join(bestY.withColumn("__mutual", lit(true)), Seq("x_id", "y_id"), "left")
      .select(col("x_id"), col("y_id"), col("cos_micro"), col("margin_micro"),
        coalesce(col("__mutual"), lit(false)).as("mutual"),
        (coalesce(col("__mutual"), lit(false)) &&
          col("margin_micro") > thresholdMicro).as("is_mined"))
  }
}
