package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Split conformal prediction (Vovk et al.; Lei et al. 2018) — the
 * distribution-free interval recipe every eval pipeline can afford:
 * fit any point predictor on a TRAIN split, take the
 * ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on a held-out
 * CALIBRATION split as the radius q̂, and the interval ŷ ± q̂ covers a
 * fresh point with probability ≥ 1−α, no matter what the data looks
 * like. The marginal-coverage guarantee is the entire point — it holds
 * for the crude per-group integer-mean predictor used here exactly as
 * it would for a neural regressor.
 *
 * Package discipline: splits are the seeded-md5
 * [[DatasetSplit.assignSplits]] buckets (train/cal=val/test), the
 * predictor is an INTEGER floor-mean (Σy div n) per group, residuals
 * are exact integers, q̂ is an order statistic (never an interpolated
 * quantile), and coverage is one integral micro division — everything
 * replayable bit-for-bit by a SQL oracle.
 *
 * 100 TB shape: the predictor table is |groups| rows (broadcast); the
 * calibration-score relation reduces to a HISTOGRAM before the rank
 * scan (map-side combine), and the rank itself is the two-level
 * cumulative-count discipline of [[StatTests]] — a partitioned window
 * over score blocks plus a bounded driver prefix, never a global sort.
 * Test rows are scored scan-locally against the broadcast predictor
 * and the 1-row q̂ relation.
 */
object Conformal {

  /** Internal: (train-fit predictor table, calibration scores,
    * test rows with predictions). */
  private def pieces(
      df: DataFrame, idCol: String, groupCol: String, yCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val s = DatasetSplit.assignSplits(
      df.select(col(idCol), col(groupCol), col(yCol)), idCol)
    val train = s.filter(col("split") === "train")
    val yhat = train.groupBy(col(groupCol))
      .agg(expr(s"sum($yCol) div count(1)").as("yhat"))
    val cal = s.filter(col("split") === "val")
      .join(broadcast(yhat), groupCol)
      .select(abs(col(yCol) - col("yhat")).as("__s"))
    val test = s.filter(col("split") === "test")
      .join(broadcast(yhat), groupCol)
      .select(col(idCol), col(groupCol), col(yCol), col("yhat"))
    (yhat, cal, test)
  }

  /** The conformal radius: q̂ = the r-th smallest calibration residual,
    * r = ⌈(n_cal+1)(1−α)⌉ capped at n_cal (the cap is the conservative
    * fallback when the calibration split is too small for the target
    * level). 1-row relation (n_cal, r, qhat). */
  private def radius(
      cal: DataFrame, alphaPct: Int,
      bucketWidth: Long, maxBlocks: Int): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50,
      s"alphaPct must be in [1, 50], got $alphaPct")
    val hist = cal.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val cum = StatTests.cumulativeOverValue(hist, "__s", Seq("__c"),
      bucketWidth, maxBlocks)
    val tot = hist.agg(sum("__c").as("n_cal"))
      .select(col("n_cal").cast("long").as("n_cal"),
        expr(s"least(((n_cal + 1) * ${100 - alphaPct} + 99) div 100, n_cal)")
          .as("r"))
    cum.crossJoin(broadcast(tot))
      .filter(col("__c_cum") >= col("r"))
      .groupBy(col("n_cal"), col("r"))
      .agg(min(col("__s")).as("qhat"))
  }

  /**
   * Per-test-row conformal intervals: (id, group, y, yhat, lo, hi,
   * covered) ordered by id. Test rows whose group never appears in
   * the train split have no predictor and are excluded (inner join —
   * the standard "cannot predict an unseen category" contract).
   */
  def intervals(
      df: DataFrame, idCol: String, groupCol: String, yCol: String,
      alphaPct: Int = 10, bucketWidth: Long = 1000L,
      maxBlocks: Int = 4096): DataFrame = {
    val (_, cal, test) = pieces(df, idCol, groupCol, yCol)
    val q = radius(cal, alphaPct, bucketWidth, maxBlocks)
      .select(col("qhat"))
    test.crossJoin(broadcast(q))
      .select(col(idCol), col(groupCol), col(yCol), col("yhat"),
        (col("yhat") - col("qhat")).as("lo"),
        (col("yhat") + col("qhat")).as("hi"),
        (abs(col(yCol) - col("yhat")) <= col("qhat")).as("covered"))
      .orderBy(idCol)
  }

  /**
   * The one-row coverage card: (n_cal, r, qhat, n_test,
   * coverage_micro). The conformal guarantee says coverage_micro ≥
   * (100−α)% · 10⁶ in expectation — the spec pins it empirically.
   */
  def card(
      df: DataFrame, idCol: String, groupCol: String, yCol: String,
      alphaPct: Int = 10, bucketWidth: Long = 1000L,
      maxBlocks: Int = 4096): DataFrame = {
    val (_, cal, test) = pieces(df, idCol, groupCol, yCol)
    val q = radius(cal, alphaPct, bucketWidth, maxBlocks)
    test.crossJoin(broadcast(q))
      .groupBy(col("n_cal"), col("r"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col(yCol) - col("yhat")) <= col("qhat"), 1L)
          .otherwise(0L)).as("__cov"))
      .select(col("n_cal"), col("r"), col("qhat"), col("n_test"),
        expr("(1000000 * __cov) div n_test").as("coverage_micro"))
  }
}
