package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * l-diversity card (Machanavajjhala et al. 2006) — the middle rung
   * of the release ladder between k-anonymity (group SIZE) and
   * t-closeness (distribution SHAPE): each quasi-identifier group
   * must contain at least `l` "well-represented" sensitive values.
   * Reports BOTH published variants: distinct l-diversity
   * (|distinct sensitive| ≥ l) and the stronger entropy l-diversity
   * (H(group) ≥ log l — a group with l−1 rare values and one dominant
   * value passes distinct-l but still leaks).
   *
   * Entropy is exact on the package's log grid: per sensitive value
   * with count c in a group of n, the contribution is
   * c·(round(log10 n, 6) − round(log10 c, 6)) in DECIMAL, summed
   * exactly, and `entropy_micro = (Σ·10⁶) div n` — bitwise identical
   * in any engine. The pass threshold `log10(l)·10⁶` is pinned ONCE
   * here and shared with the oracle as an integer literal.
   *
   * Shape: one corpus aggregate to (QI × sensitive) cells, then
   * metadata-sized joins — the t-closeness economics.
   */
  def lDiversityCard(
      docs: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l > 1, s"l must be > 1, got $l")
    val cells = docs
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cells.groupBy(qiCols.map(col): _*)
      .agg(sum("__c").as("n_docs"),
        count(lit(1)).as("l_distinct"))
    val dl = (c: Column) => round(log10(c), 6).cast("decimal(28,6)")
    val ent = cells.join(groups, qiCols)
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c") * (dl(col("n_docs")) - dl(col("__c"))))
        .cast("decimal(38,6)").as("__es"))
    val thresholdMicro = logLMicro(l)
    groups.join(ent, qiCols)
      .select(qiCols.map(col) :+ col("n_docs") :+ col("l_distinct") :+
        expr("CAST((__es * 1000000) div n_docs AS BIGINT)")
          .as("entropy_micro"): _*)
      .withColumn("distinct_pass", col("l_distinct") >= l)
      .withColumn("entropy_pass", col("entropy_micro") >= thresholdMicro)
  }

  /** log10(l) on the 6-dp micro grid — the entropy l-diversity
    * threshold, pinned once and shared with the SQL oracle. */
  def logLMicro(l: Int): Long =
    BigDecimal(math.log10(l.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLong

  /** t-closeness card (Li, Li & Venkatasubramanian, ICDE 2007): for
    * each quasi-identifier group, the Earth Mover's Distance between
    * the group's distribution over an ORDERED sensitive attribute and
    * the whole table's distribution. k-anonymity bounds group SIZE and
    * l-diversity bounds distinct VALUES, but a group whose sensitive
    * values are all drawn from one tail still leaks — t-closeness is
    * the release gate that catches it.
    *
    * The sensitive attribute is bucketed (`sensitive div bucketWidth`)
    * into an ordered domain of m bins; for equal-spaced ordered bins
    * EMD has the closed form `(1/(m-1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|`.
    * All arithmetic is EXACT: with group size n_g, table size N and
    * per-bin counts c_j (group) / C_j (table), the inner cumulative
    * sum is the integer `Σ_{j≤i} (c_j·N − C_j·n_g)` carried in
    * DECIMAL(38,0), and the reported value is
    * `emd_micro = (10^6 · Σ_i |cum_i|) div ((m−1)·n_g·N)` — a BIGINT
    * both engines reproduce bitwise (the DuckDB oracle replays the
    * same sums in HUGEINT).
    *
    * Shape at 100 TB: ONE corpus-sized map-side-partial aggregate
    * builds the (QI × bin) cell relation; every later step — bin
    * domain, group totals, the cumulative window — runs on that
    * metadata-sized relation (|groups|·|bins| rows), with the bin
    * domain and the 1-row total broadcast. The per-group window is
    * partitioned by the QI columns, so no global sort exists.
    */
  def tClosenessCard(
      docs: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      bucketWidth: Long, tMicro: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(tMicro >= 0, s"tMicro must be >= 0, got $tMicro")
    val qi = qiCols.map(col)
    val base = docs.select(qi :+
      expr(s"CAST($sensitiveCol AS BIGINT) div $bucketWidth").as("__b"): _*)
    // The one corpus-sized aggregate: per (QI, bin) counts.
    val cell = base.groupBy(qi :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cell.groupBy(qi: _*).agg(sum("__c").as("__n_g"))
    val bins = cell.groupBy("__b").agg(sum("__c").as("__cb"))
    val totals = bins.agg(sum("__cb").as("__n_total"),
      count(lit(1)).as("__m"))
    val dec = "DECIMAL(38,0)"
    val grid = groups
      .crossJoin(broadcast(bins))
      .join(cell, qiCols :+ "__b", "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(broadcast(totals))
    val w = Window.partitionBy(qi: _*).orderBy("__b")
    val cum = grid.withColumn("__cum",
      sum(expr(s"CAST(__c AS $dec) * __n_total - CAST(__cb AS $dec) * __n_g"))
        .over(w))
    val agg = cum.groupBy(qi: _*).agg(
      max("__n_g").as("__n_g"), max("__m").as("__m"),
      max("__n_total").as("__n_total"),
      sum(abs(col("__cum"))).as("__s"))
    val emd = expr(s"CASE WHEN __m > 1 THEN CAST((1000000 * __s) div " +
      s"((__m - 1) * CAST(__n_g AS $dec) * __n_total) AS BIGINT) " +
      "ELSE 0 END")
    agg.select(qi :+ col("__n_g").cast("long").as("n_docs") :+
      emd.as("emd_micro") :+ (emd > tMicro).as("exceeds_t"): _*)
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
