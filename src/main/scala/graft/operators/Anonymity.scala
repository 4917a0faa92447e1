package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-anonymity operators over quasi-identifier columns — the
 * governance gate a dataset passes before release: a row whose
 * quasi-identifier combination (language, source, ...) is shared by
 * fewer than k rows is re-identifiable by linkage (Sweeney 2002), and
 * the standard first response is SUPPRESSION — blank the
 * quasi-identifiers of the at-risk rows, keep the payload.
 * [[graft.operators.Pii]] handles direct identifiers IN the text;
 * this handles the indirect ones in the metadata.
 *
 * Shape at 100 TB: the group-size relation is |distinct QI
 * combinations| rows — orders of magnitude smaller than the corpus —
 * built by ONE map-side-partial aggregate and broadcast back; the
 * suppression rewrite is then a scan-local projection. Nothing
 * corpus-sized ever shuffles.
 */
object Anonymity {

  /** Redaction marker used by [[suppressSmallGroups]]. */
  val Redacted = "*"

  /** Per-group risk card: quasi-identifier values, group size, the
    * at-risk flag (n < k), and the group's distinct-content count
    * (md5 fingerprints of `contentCol`) — the l-diversity-style
    * evidence column: a group that is large but all-identical content
    * still tells a linker everything. */
  def kAnonymityCard(
      docs: DataFrame, qiCols: Seq[String], contentCol: String,
      k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 1, s"k must be > 1, got $k")
    docs.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(contentCol).cast("binary"))).as("l_distinct"))
      .select(qiCols.map(col) :+ col("n_docs") :+ col("l_distinct") :+
        (col("n_docs") < k).as("at_risk"): _*)
  }

  /** Suppression rewrite: rows in quasi-identifier groups smaller
    * than k get every QI column replaced with [[Redacted]]; all other
    * rows pass through. Output schema = input schema. */
  def suppressSmallGroups(
      docs: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 1, s"k must be > 1, got $k")
    val sizes = docs.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val joined = docs.join(broadcast(sizes), qiCols)
    val out = docs.columns.map { c =>
      if (qiCols.contains(c))
        when(col("__n") < k, lit(Redacted)).otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(out.toSeq: _*)
  }
}
