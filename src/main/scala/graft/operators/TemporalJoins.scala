package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators over event streams — beyond-reference scope
 * (named gaps in standard engines that Spark lacks as built-ins: as-of
 * join, range join). Both are expressed by composing existing operators
 * (SURVEY preference order (a)) in the shape a 1000-executor cluster
 * wants:
 *
 *  - as-of join: ONE shuffle by key + an in-partition time sort (the
 *    union-and-carry-forward formulation) — never a per-row probe.
 *  - range join: equality join on (key, time bucket) with the left side
 *    covering two adjacent buckets, then an exact range filter — never
 *    an inequality-only join (which would be a cartesian per key).
 */
object TemporalJoins {

  /**
   * As-of join: for each left row, the single most recent right row
   * with `right.ts <= left.ts` and the same key (inclusive, ties on
   * equal ts resolve to the right row — the conventional ASOF
   * semantics).
   *
   * Implementation: tag both sides, union, and per key carry the last
   * right-side payload forward over a time-ordered window. At equal
   * timestamps the right side sorts first, making the match inclusive.
   * Left rows with no prior right row are dropped (inner as-of).
   *
   * @param left  (key, ts, leftCols…)
   * @param right (key, ts, payload) — pre-deduplicated per (key, ts)
   * @param payloadCols right columns carried to the output
   */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val side = "__side" // 0 = right (sorts first at equal ts), 1 = left
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as(side)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as(side)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) => df.withColumn(s"__m_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }.withColumn("__m_ts",
      last(when(col(side) === 0, col(tsCol)), ignoreNulls = true).over(w))
    carried
      .filter(col(side) === 1 && col("__m_ts").isNotNull)
      .select(
        Seq(col(keyCol), col(tsCol)) ++
          leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
          (col("__m_ts").as(s"matched_$tsCol") +:
            payloadCols.map(c => col(s"__m_$c").as(s"matched_$c"))): _*)
  }

  /**
   * Range self-join: pairs of rows sharing `keyCol` with
   * `0 < b.ts - a.ts <= range`. The left side is exploded into its own
   * time bucket and the next one (bucket width = range), so every
   * qualifying pair meets on exactly one (key, bucket) equality key —
   * no inequality-only join, no duplicates, no dedup pass.
   */
  def rangeSelfJoin(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      rangeSeconds: Long): DataFrame = {
    val bucketUs = rangeSeconds * 1000000L
    val bucket = (unix_micros(col(tsCol)) / bucketUs).cast("long")
    val a = df.select(col(keyCol), col(tsCol).as("a_ts"), col(idCol).as("a_id"),
        explode(array(bucket, bucket + 1)).as("__bk"))
    val b = df.select(col(keyCol).as("__bkey"), col(tsCol).as("b_ts"),
        col(idCol).as("b_id"), bucket.as("__bk"))
    a.join(b, a(keyCol) === b("__bkey") && a("__bk") === b("__bk"))
      .filter(col("b_ts") > col("a_ts") &&
        unix_micros(col("b_ts")) - unix_micros(col("a_ts")) <= bucketUs)
      .select(col("a_id"), col("b_id"), col(keyCol), col("a_ts"), col("b_ts"))
  }
}
