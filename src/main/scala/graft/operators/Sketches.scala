package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count–Min Sketch over corpus term frequencies — the third sketch
 * family beside the HLL distinct-gram estimator
 * ([[TextAnalysis.ngramDiversityApprox]]) and the bloom-filter join
 * prune ([[BloomJoin]]). At 100 TB the exact term-frequency relation
 * is itself huge (open web vocab ≈ billions of keys with a long tail);
 * a CMS answers point-frequency queries from d·w counters with a
 * one-sided error: estimate ≥ truth always, estimate ≤ truth + εN with
 * probability 1−δ (ε = e/w, δ = e^−d — Cormode & Muthukrishnan 2005).
 *
 * Everything is deterministic relational algebra, no sketch library:
 * the d hash rows are md5-derived buckets (seeded "cms:j:"), the
 * sketch is a (j, bucket, cnt) relation of ≤ d·w rows, and a point
 * query is min over j of the matching cells. Build shape: ONE
 * pre-aggregate to exact per-term counts (map-side partials over the
 * token stream), then the d-way explode runs over |vocab| rows, not
 * |tokens| — the standard two-level fold. The estimate never needs
 * the exact counts at query time; the driver row carries both only so
 * the oracle can check the estimate against its own reconstruction.
 */
object CountMinSketch {

  /** md5-seeded bucket for hash row `j`: value of the digest's first
    * two hex nibbles (0..255) modulo `width`. */
  def bucket(term: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms:$j:"), term)), 1, 2), 16, 10)
      .cast("int") % width

  /** Exact per-term counts of the space-token stream — the CMS input
    * relation (and the oracle's ground truth). */
  def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Build the (j, bucket, cnt) sketch relation, depth × width cells
    * max. */
  def build(docs: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2, s"cms $depth x $width")
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(col("term"), j, width).as("bucket")))
    termCounts(docs, textCol)
      .select(explode(array(cells: _*)).as("cell"), col("cnt"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(sum("cnt").as("cnt"))
  }

  /** Point-frequency estimates for `queryTerms` (a small relation with
    * a `term` column): min over hash rows of the matched cell. A term
    * whose cell is absent (never incremented) estimates 0. */
  def estimate(
      sketch: DataFrame, queryTerms: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(col("term"), j, width).as("bucket")))
    queryTerms
      .select(col("term"), explode(array(cells: _*)).as("cell"))
      .join(broadcast(sketch),
        col("cell.j") === sketch("j") && col("cell.bucket") === sketch("bucket"),
        "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}
