package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Incremental statistics maintenance — the WRITE-side twin of the
 * materialized-rollup rewrite ([[graft.plans.RollupRewriteRule]]): the
 * rewrite SERVES queries from a summary, this keeps the summary true
 * as the corpus grows, without ever rescanning old data. A 100 TB
 * corpus datacard refresh touches only the delta batch: state(old) is
 * already on disk, state(delta) is one scan of the new files, and
 * merge(state(old), state(delta)) == state(old ∪ delta) because every
 * tracked statistic is MERGE-CLOSED —
 *
 *   cnt   (count)          merges by sum
 *   sum   (exact integer)  merges by sum
 *   sumsq (DECIMAL(38,0))  merges by sum   — second moment for
 *         variance; decimal because sum of squares overflows BIGINT
 *         past ~3·10^9 rows of 4-digit values
 *   min / max              merge by min / max
 *
 * Floats are deliberately absent from the state: float sums are
 * order-dependent, so a float-typed statistic would make
 * merge-vs-rescan equality approximate. Derived values (mean) are
 * computed from the exact state by ONE final division in [[card]].
 */
object IncrementalStats {

  private val Dec = DecimalType(38, 0)

  /** Per-group merge-closed state of one batch: (groupCols..., cnt,
    * sum_v, sumsq_v, min_v, max_v). One map-side-partial hash
    * aggregate — the only pass the batch ever needs. */
  def summarize(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val vd = v.cast(Dec)
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(v).as("sum_v"),
      sum(vd * vd).cast(Dec).as("sumsq_v"),
      min(v).as("min_v"),
      max(v).as("max_v"))
  }

  /** Merge any number of states — associative and commutative, so
    * yesterday's state and today's delta state combine in one
    * (tiny: one row per group per state) aggregate. */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_.unionByName(_)).groupBy(groupCols.map(col): _*).agg(
      sum(col("cnt")).as("cnt"),
      sum(col("sum_v")).as("sum_v"),
      sum(col("sumsq_v")).cast(Dec).as("sumsq_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  /** Human card from exact state: adds mean as one double division
    * (rounded to `scale`), keeping everything upstream exact. */
  def card(state: DataFrame, scale: Int): DataFrame =
    state.withColumn("mean_v",
      round(col("sum_v").cast("double") / col("cnt").cast("double"), scale))

  /** Convenience: the strict-equality check a spec (or a pipeline
    * assertion) uses — state computed incrementally vs by full rescan. */
  def rescanEquals(full: DataFrame, mergedState: DataFrame,
      groupCols: Seq[String], valueCol: String): Boolean = {
    val a = summarize(full, groupCols, valueCol)
    val cols = (groupCols ++ Seq("cnt", "sum_v", "sumsq_v", "min_v", "max_v"))
      .map(col)
    a.select(cols: _*).exceptAll(mergedState.select(cols: _*)).isEmpty &&
      mergedState.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty
  }

  /** Internal helper for callers composing their own derived columns. */
  def meanCol(scale: Int): Column =
    round(col("sum_v").cast("double") / col("cnt").cast("double"), scale)
}
