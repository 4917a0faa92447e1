package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Two-sample drift tests and experiment-analysis statistics over
 * INTEGER-QUANTIZED metrics — the distribution-shift / A-B toolkit a
 * training-data pipeline runs between corpus snapshots, data sources,
 * or experiment arms, beside the existing JS-divergence (clustered
 * embeddings) and calibration cards. Beyond-reference scope (the
 * reference computes no statistics at all).
 *
 * Package discipline throughout: inputs are quantized to an integer
 * grid by the caller (cents, micros — an exact decimal cast, never a
 * double multiply), every count/rank/cumulative is an exact integer,
 * the only transcendentals are log10/ln/sqrt of exact integers with
 * 6-dp rounding before any further arithmetic, and sums of rounded
 * terms run in DECIMAL — so every output is bit-identical under any
 * partitioning and replayable by a SQL oracle.
 *
 * 100 TB shape: everything here reduces the corpus to a VALUE
 * HISTOGRAM first (one map-side-combinable aggregate; ≤ |domain| rows
 * — bounded by the quantization grid, not the corpus). Cumulative
 * counts over the histogram use the [[RelationalAnalytics
 * .percentileRank]] two-level discipline: a PARTITIONED window inside
 * `value div bucketWidth` blocks plus a driver prefix over ≤
 * `maxBlocks` block totals (a bounded model-boundary collect) — never
 * an unpartitioned window, never a corpus-sized sort.
 */
object StatTests {

  /** Two-level cumulative counts over the value order: for each count
    * column c, adds `<c>_cum` = Σ of c over rows with value ≤ this
    * row's. Driver state: ≤ maxBlocks block totals. Shared with
    * [[Conformal]]'s order-statistic rank scan. */
  private[operators] def cumulativeOverValue(
      hist: DataFrame, valueCol: String, countCols: Seq[String],
      bucketWidth: Long, maxBlocks: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth > 0, s"bucketWidth: $bucketWidth")
    val spark = hist.sparkSession
    val withBlock =
      hist.withColumn("__blk", expr(s"$valueCol div $bucketWidth"))
    val blocks = withBlock.groupBy("__blk")
      .agg(countCols.head -> "sum", countCols.tail.map(_ -> "sum"): _*)
      .orderBy("__blk").collect()
    require(blocks.length <= maxBlocks,
      s"cumulativeOverValue: ${blocks.length} blocks exceed " +
        s"maxBlocks=$maxBlocks — quantize coarser or raise bucketWidth")
    val acc = Array.fill(countCols.length)(0L)
    val prefixRows = blocks.map { r =>
      val p = acc.toSeq
      countCols.indices.foreach(i => acc(i) += r.getLong(i + 1))
      (r.getLong(0), p)
    }.toSeq
    import spark.implicits._
    val prefix = prefixRows
      .map { case (b, ps) => (b, ps.toArray) }
      .toDF("__blk", "__p")
    val w = Window.partitionBy("__blk").orderBy(valueCol)
    countCols.zipWithIndex.foldLeft(
      withBlock.join(broadcast(prefix), "__blk")) {
      case (df, (c, i)) =>
        df.withColumn(s"${c}_cum",
          element_at(col("__p"), i + 1) + sum(col(c)).over(w))
    }.drop("__blk", "__p")
  }

  /**
   * Exact two-sample Kolmogorov–Smirnov statistic between groups `a`
   * and `b` of an integer-quantized metric:
   *
   *   D = max_v |F_a(v) − F_b(v)|
   *     = max_v |C_a(v)·n_b − C_b(v)·n_a| / (n_a·n_b)
   *
   * computed entirely on the cumulative-count grid, so `ks_micro =
   * 10⁶·max|…| div (n_a·n_b)` is exact (floor is monotone, so the max
   * of floored ratios is the floored max). The classic drift gate
   * between corpus snapshots or A/B arms.
   *
   * Output: one row (n_a, n_b, ks_micro).
   */
  def ksTwoSample(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    val hist = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("__cb"))
    val cum = cumulativeOverValue(hist, "__v", Seq("__ca", "__cb"),
      bucketWidth, maxBlocks)
    // the |·| term needs n_a/n_b per grid row — a 1-row totals
    // relation joins back onto the bounded histogram grid
    val tot = hist.agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(expr("CAST(__ca_cum AS DECIMAL(38,0)) * n_b - " +
          "CAST(__cb_cum AS DECIMAL(38,0)) * n_a")).as("__num"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max("__num").as("__mx"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        expr("CAST((1000000 * __mx) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("ks_micro"))
  }

  /**
   * Exact 1-D Wasserstein (earth-mover) distance between two groups
   * of an integer-quantized metric:
   *
   *   W₁ = ∫ |F_a(v) − F_b(v)| dv
   *      = Σ_grid |C_a(v)·n_b − C_b(v)·n_a| · gap(v) / (n_a·n_b)
   *
   * over the distinct-value grid (gap = distance to the next grid
   * value). The MAGNITUDE-sensitive drift metric next to
   * [[ksTwoSample]] (max discrepancy, location-blind) and [[psi]]
   * (bin log-odds): W₁ answers "how far did the distribution move in
   * metric units", which is what a cost model consumes. All products
   * stay in DECIMAL(38,0) (|cum diff| ≤ n_a·n_b ≲ 10²⁴ at corpus
   * scale, × 10⁶ grid span × 10⁶ micro ≲ 10³⁶), so `w1_micro` =
   * 10⁶·W₁ in the metric's own units is exact.
   *
   * Shape: the same two-level cumulative scan as the KS card (blocked
   * window + driver prefix over ≤ maxBlocks totals, never an
   * unpartitioned window); the gap column needs one extra boundary
   * relation — the next block's MINIMUM value per block, a ≤
   * maxBlocks-row broadcast derived from the same block pass.
   *
   * Output: one row (n_a, n_b, w1_micro).
   */
  def wasserstein1(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val hist = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("__cb"))
      .localCheckpoint(true)
    val cum = cumulativeOverValue(hist, "__v", Seq("__ca", "__cb"),
      bucketWidth, maxBlocks)
    // Block-boundary gaps: the global "next distinct value" of a
    // block's last row is the NEXT block's minimum — a bounded
    // driver-side pairing of the ordered block minima.
    val blkMins = hist
      .withColumn("__blk", expr(s"__v div $bucketWidth"))
      .groupBy("__blk").agg(min("__v").as("__bmin"))
      .orderBy("__blk").collect()
    require(blkMins.length <= maxBlocks,
      s"wasserstein1: ${blkMins.length} blocks exceed maxBlocks=$maxBlocks")
    val nextMin = blkMins.toSeq.sliding(2).collect {
      case Seq(cur, nxt) => (cur.getLong(0), nxt.getLong(1))
    }.toSeq
    import spark.implicits._
    val nextDf = nextMin.toDF("__blk", "__next_bmin")
    val wBlk = Window.partitionBy("__blk").orderBy("__v")
    val tot = hist.agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"))
    cum.withColumn("__blk", expr(s"__v div $bucketWidth"))
      .join(broadcast(nextDf), Seq("__blk"), "left")
      .withColumn("__nextv",
        coalesce(lead(col("__v"), 1).over(wBlk), col("__next_bmin")))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (abs(expr("CAST(__ca_cum AS DECIMAL(38,0)) * n_b - " +
          "CAST(__cb_cum AS DECIMAL(38,0)) * n_a")) *
          expr("CAST(coalesce(__nextv - __v, 0) AS DECIMAL(38,0))"))
          .as("__area"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum("__area").as("__s"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        expr("CAST((1000000 * __s) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("w1_micro"))
  }

  /**
   * Per-quantile shift table between two groups — the "WHERE did the
   * distribution move" companion to [[wasserstein1]]'s single number:
   * for each q = 1..`quantiles`, the exact order statistics v_a(q),
   * v_b(q) at rank ⌈q·n/quantiles⌉ and their signed difference. A
   * location shift moves every row equally; a tail-only regression
   * shows up in the last rows alone — the distinction that decides
   * between "recalibrate" and "hunt the tail".
   *
   * Exact integer order statistics via the same two-level cumulative
   * grid as the KS/W1 cards: v_g(q) = min grid value whose cumulative
   * count reaches rank_q = ⌈q·n_g/quantiles⌉ (ceiling in integers:
   * (q·n_g + Q − 1) div Q). The quantile relation is `quantiles`
   * rows, broadcast onto the bounded grid.
   *
   * Output: (q, v_a, v_b, shift) for q = 1..quantiles, ordered by q.
   */
  def quantileShift(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String, quantiles: Int = 10,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    require(quantiles >= 2, s"quantiles must be >= 2, got $quantiles")
    val spark = df.sparkSession
    val hist = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("__cb"))
      .localCheckpoint(true)
    val cum = cumulativeOverValue(hist, "__v", Seq("__ca", "__cb"),
      bucketWidth, maxBlocks)
    val tot = hist.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    import spark.implicits._
    val qs = (1 to quantiles).map(_.toLong).toDF("q")
    val ranked = cum.crossJoin(broadcast(qs)).crossJoin(broadcast(tot))
      .withColumn("__ra", expr(s"(q * __na + $quantiles - 1) div $quantiles"))
      .withColumn("__rb", expr(s"(q * __nb + $quantiles - 1) div $quantiles"))
    val va = ranked.filter(col("__ca_cum") >= col("__ra"))
      .groupBy("q").agg(min("__v").as("v_a"))
    val vb = ranked.filter(col("__cb_cum") >= col("__rb"))
      .groupBy("q").agg(min("__v").as("v_b"))
    va.join(vb, "q")
      .select(col("q"), col("v_a"), col("v_b"),
        (col("v_b") - col("v_a")).as("shift"))
      .orderBy("q")
  }

  /**
   * Population stability index between a REFERENCE group and a
   * COMPARISON group, over `bins` equal-width bins of the reference's
   * integer-quantized value range (out-of-range comparison values
   * clamp to the edge bins — the standard scorecard convention).
   * Add-one smoothing keeps empty bins finite. With r_i = cnt_ref+1,
   * c_i = cnt_cmp+1, R = n_ref + bins, C = n_cmp + bins:
   *
   *   term_i = (r_i/R − c_i/C) · ln((r_i·C)/(c_i·R))
   *
   * where the log is the package's rounded-log10-of-integers
   * convention times a fixed 6-dp ln(10), and the rational prefactor
   * stays exact: `term_micro = ((r_i·C − c_i·R) · λ_micro) div (R·C)`
   * in DECIMAL(38,0) (headroom: counts·bins ≲ 10¹⁵). PSI < 0.1 stable
   * / 0.1–0.25 moderate / > 0.25 major shift — the industry card.
   *
   * Output: one row (n_ref, n_cmp, psi_micro).
   */
  def psi(
      df: DataFrame, groupCol: String, valueCol: String,
      ref: String, cmp: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    val vals = df.filter(col(groupCol).isin(ref, cmp) &&
      col(valueCol).isNotNull)
    val bounds = vals.filter(col(groupCol) === ref)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val binned = vals.crossJoin(broadcast(bounds))
      .select(col(groupCol).as("__g"),
        least(lit(bins - 1), greatest(lit(0),
          expr(s"(CAST($valueCol AS DECIMAL(38,0)) - __lo) * $bins div " +
            s"greatest(__hi - __lo + 1, 1)").cast("int"))).as("__bin"))
    val counts = binned.groupBy("__bin")
      .agg(sum(when(col("__g") === ref, 1L).otherwise(0L)).as("__cr"),
        sum(when(col("__g") === ref, 0L).otherwise(1L)).as("__cc"))
    // all `bins` bins participate (empty ones via the smoothing +1)
    val spark = df.sparkSession
    import spark.implicits._
    val allBins = (0 until bins).map(_.toLong).toDF("__bin")
    val grid = allBins.join(counts, Seq("__bin"), "left")
      .na.fill(0L, Seq("__cr", "__cc"))
    val tot = grid.agg((sum("__cr") + bins).as("__R"),
      (sum("__cc") + bins).as("__C"),
      sum("__cr").cast("long").as("n_ref"),
      sum("__cc").cast("long").as("n_cmp"))
    // λ·10⁶ as an EXACT integer: the 6-dp rounded log10s difference
    // scaled by 10⁶ (an integer-valued decimal), times the fixed 6-dp
    // ln(10) micro constant 2302585; the term divides once, floored —
    // no double round-half anywhere, so both engines agree bit-for-bit
    grid.crossJoin(broadcast(tot))
      .select(col("n_ref"), col("n_cmp"),
        expr("CAST(__cr + 1 AS DECIMAL(38,0)) * __C").as("__a"),
        expr("CAST(__cc + 1 AS DECIMAL(38,0)) * __R").as("__b"),
        expr("CAST(__R AS DECIMAL(38,0)) * __C").as("__rc"))
      .select(col("n_ref"), col("n_cmp"),
        expr(
          """((__a - __b) * CAST(CAST(round(log10(__a), 6) AS DECIMAL(28,6))
            | * 1000000 - CAST(round(log10(__b), 6) AS DECIMAL(28,6))
            | * 1000000 AS DECIMAL(38,0)) * 2302585)
            | div (__rc * CAST(1000000000000 AS DECIMAL(38,0)))"""
            .stripMargin.replace("\n", " ")).as("__term"))
      .groupBy(col("n_ref"), col("n_cmp"))
      .agg(sum("__term").cast("long").as("psi_micro"))
      .select(col("n_ref"), col("n_cmp"), col("psi_micro"))
  }

  /**
   * Mann–Whitney U (Wilcoxon rank-sum) between groups `a` and `b` of
   * an integer-quantized metric, with midrank tie handling via the
   * DOUBLED-rank trick (the [[Evaluation]] DeLong discipline): for a
   * value with `t` ties and `less` strictly-smaller rows, every tied
   * row's doubled midrank is the exact integer `2·less + t + 1`, so
   * `u2 = 2·U_a = 2·n_a·n_b + n_a(n_a+1) − 2·R_a` stays integral.
   * The normal-approximation z uses the tie-corrected variance
   *
   *   σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))
   *
   * computed in doubles FROM exact integers and rounded to 6 dp — the
   * one place arithmetic leaves the integer grid. No continuity
   * correction (documented; both engines replay the same formula).
   *
   * Output: one row (n_a, n_b, u2, z).
   */
  def mannWhitney(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    val hist = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val cum = cumulativeOverValue(hist, "__v", Seq("__t"), bucketWidth,
      maxBlocks)
    val agg = cum.agg(
      sum("__ca").as("n_a"), sum("__cb").as("n_b"),
      // Σ over a-rows of doubled midrank: ca·(2·less + t + 1) where
      // less = cum − t
      sum(expr("CAST(__ca AS DECIMAL(38,0)) * (2 * (__t_cum - __t) + __t + 1)"))
        .as("__r2a"),
      sum(expr("CAST(__t AS DECIMAL(38,0)) * __t * __t - __t")).as("__ties"))
    agg
      .select(
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        expr("""CAST(2 * CAST(n_a AS DECIMAL(38,0)) * n_b
               | + CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) - __r2a AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("u2"),
        col("__ties"))
      .select(col("n_a"), col("n_b"), col("u2"),
        expr(
          """round((CAST(u2 AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)
            | / sqrt(CAST(n_a AS DOUBLE) * n_b / 12 *
            |   ((n_a + n_b + 1) - CAST(__ties AS DOUBLE) /
            |     (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 6)"""
            .stripMargin.replace("\n", " ")).as("z"))
  }

  /**
   * Spearman rank correlation (Spearman 1904) between two
   * integer-quantized columns — the monotone-association staple for
   * corpus signals (doc length vs token count, quality score vs dup
   * rate) where Pearson on raw values is whale-dominated. Ties get
   * textbook MIDRANKS, carried as DOUBLED integers (2·less + cnt + 1,
   * the [[mannWhitney]] convention) so every rank is exact; ρ is then
   * Pearson on the doubled ranks: the moment sums are exact
   * DECIMAL(38,0) (the [[cuped]] discipline; doubling cancels in the
   * ratio), and ρ leaves the integer grid ONCE, as
   * `round(Sxy / sqrt(Sxx·Syy), 6)` — identical double sequence in
   * the SQL oracle. Zero variance on either side reports ρ = 0.
   *
   * Shape at 100 TB: midranks come from the per-VALUE histogram
   * (scan-local agg), cumulated by [[cumulativeOverValue]] (driver
   * holds ≤ maxBlocks block totals — never a corpus-sized window),
   * joined back by value; then one moment aggregate. Exactness bound:
   * doubled ranks ≤ 2n, so Σr² ≤ 4n³ stays double-exact (< 2⁵³) to
   * n ≈ 1.3·10⁵ per the final cast — past that ρ is ±1 ulp, still
   * deterministic (both engines cast the same exact decimal).
   *
   * Output: one row (n, rho).
   */
  def spearmanCard(
      df: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    def ranks(c: String): DataFrame = {
      val hist = rows.groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
      cumulativeOverValue(hist, "__v", Seq("__c"), bucketWidth, maxBlocks)
        .select(col("__v").as(c),
          (lit(2L) * (col("__c_cum") - col("__c")) + col("__c") + lit(1L))
            .as(s"${c}_r2"))
    }
    rows
      .join(ranks("__x"), "__x").join(ranks("__y"), "__y")
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x_r2").cast("decimal(38,0)")).as("__sa"),
        sum(col("__y_r2").cast("decimal(38,0)")).as("__sb"),
        sum(expr("CAST(__x_r2 AS DECIMAL(38,0)) * __x_r2")).as("__saa"),
        sum(expr("CAST(__x_r2 AS DECIMAL(38,0)) * __y_r2")).as("__sab"),
        sum(expr("CAST(__y_r2 AS DECIMAL(38,0)) * __y_r2")).as("__sbb"))
      .select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * __saa - __sa * __sa").as("__Sxx"),
        expr("CAST(n AS DECIMAL(38,0)) * __sab - __sa * __sb").as("__Sxy"),
        expr("CAST(n AS DECIMAL(38,0)) * __sbb - __sb * __sb").as("__Syy"))
      .select(col("n").cast("long").as("n"),
        when(col("__Sxx") > 0 && col("__Syy") > 0,
          round(col("__Sxy").cast("double") /
            sqrt(col("__Sxx").cast("double") * col("__Syy").cast("double")),
            6)).otherwise(lit(0.0)).as("rho"))
  }

  /**
   * CUPED variance reduction (Deng et al. 2013) — the standard
   * experiment-sensitivity trick: adjust each unit's post-period
   * metric by its pre-period covariate, y′ = y − θ(x − x̄), with
   * θ = Sxy/Sxx from the same data. Inputs are exact integer
   * (quantized) per-unit sums; the moment sums
   * Sxx = n·Σx² − (Σx)², Sxy = n·Σxy − Σx·Σy, Syy = n·Σy² − (Σy)²
   * are exact DECIMAL(38,0); θ and the variances leave the integer
   * grid once, as doubles rounded to 6 dp (identical formula in the
   * oracle). Variances are population moments over n² (the ratio is
   * scale-free, so the convention only needs to match the replay).
   *
   * Output: one row (n_units, theta, var_y, var_adj, reduction_micro)
   * — reduction_micro = round(10⁶·(1 − var_adj/var_y)).
   */
  def cuped(
      units: DataFrame, xCol: String, yCol: String): DataFrame = {
    val m = units.agg(
      count(lit(1)).as("n_units"),
      sum(col(xCol).cast("decimal(38,0)")).as("__sx"),
      sum(col(yCol).cast("decimal(38,0)")).as("__sy"),
      sum(expr(s"CAST($xCol AS DECIMAL(38,0)) * $xCol")).as("__sxx"),
      sum(expr(s"CAST($xCol AS DECIMAL(38,0)) * $yCol")).as("__sxy"),
      sum(expr(s"CAST($yCol AS DECIMAL(38,0)) * $yCol")).as("__syy"))
    m.select(col("n_units"),
        expr("CAST(n_units AS DECIMAL(38,0)) * __sxx - __sx * __sx").as("__Sxx"),
        expr("CAST(n_units AS DECIMAL(38,0)) * __sxy - __sx * __sy").as("__Sxy"),
        expr("CAST(n_units AS DECIMAL(38,0)) * __syy - __sy * __sy").as("__Syy"))
      .select(col("n_units"),
        when(col("__Sxx") > 0,
          round(col("__Sxy").cast("double") / col("__Sxx").cast("double"), 6))
          .otherwise(lit(0.0)).as("theta"),
        col("__Sxx"), col("__Sxy"), col("__Syy"))
      .select(col("n_units"), col("theta"),
        round(col("__Syy").cast("double") /
          expr("CAST(n_units AS DOUBLE) * n_units * n_units"), 6).as("var_y"),
        round((col("__Syy").cast("double")
          - lit(2.0) * col("theta") * col("__Sxy").cast("double")
          + col("theta") * col("theta") * col("__Sxx").cast("double")) /
          expr("CAST(n_units AS DOUBLE) * n_units * n_units"), 6).as("var_adj"))
      .select(col("n_units"), col("theta"), col("var_y"), col("var_adj"),
        when(col("var_y") > 0,
          round((lit(1.0) - col("var_adj") / col("var_y")) * 1e6)
            .cast("long")).otherwise(0L).as("reduction_micro"))
  }

  /**
   * Robust-mean card: plain, trimmed and winsorized means of an
   * integer-quantized metric, all EXACT from the value histogram —
   * the outlier-proof summary trio for skewed metrics (spend, doc
   * length) where the plain mean is three whales and dust.
   *
   * With n rows and `trimPct` cut from EACH tail, lo = n·trimPct div
   * 100: the trimmed mean averages ranks [lo+1, n−lo] — per histogram
   * value the kept multiplicity is the exact interval overlap
   * max(0, min(cum, n−lo) − max(cum−c, lo)) — and the winsorized mean
   * clamps every value to [q(lo+1), q(n−lo)] (order statistics from
   * the same cumulative grid). Three integral micro divisions; no
   * doubles anywhere.
   *
   * Output: one row (n, lo_cut, p_lo, p_hi, mean_micro,
   * trimmed_mean_micro, winsorized_mean_micro).
   */
  def robustMean(
      df: DataFrame, valueCol: String, trimPct: Int = 5,
      bucketWidth: Long = 1000L, maxBlocks: Int = 4096): DataFrame = {
    require(trimPct >= 1 && trimPct <= 25,
      s"trimPct must be in [1, 25], got $trimPct")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = cumulativeOverValue(hist, "__v", Seq("__c"),
      bucketWidth, maxBlocks)
    val tot = hist.agg(sum("__c").as("__n"))
      .select(col("__n").cast("long").as("n"),
        expr(s"(__n * $trimPct) div 100").as("lo_cut"))
    val g = cum.crossJoin(broadcast(tot))
    // order statistics: q(lo+1) and q(n − lo)
    val pLo = g.filter(col("__c_cum") >= col("lo_cut") + 1)
      .agg(min("__v").as("p_lo"))
    val pHi = g.filter(col("__c_cum") >= col("n") - col("lo_cut"))
      .agg(min("__v").as("p_hi"))
    g.crossJoin(broadcast(pLo)).crossJoin(broadcast(pHi))
      .select(col("n"), col("lo_cut"), col("p_lo"), col("p_hi"),
        expr("CAST(__v AS DECIMAL(38,0)) * __c").as("__sv"),
        expr("""CAST(__v AS DECIMAL(38,0)) *
               | greatest(0, least(__c_cum, n - lo_cut)
               |   - greatest(__c_cum - __c, lo_cut))"""
          .stripMargin.replace("\n", " ")).as("__tv"),
        expr("""CAST(least(greatest(__v, p_lo), p_hi) AS DECIMAL(38,0))
               | * __c""".stripMargin.replace("\n", " ")).as("__wv"))
      .groupBy(col("n"), col("lo_cut"), col("p_lo"), col("p_hi"))
      .agg(sum("__sv").as("__s"), sum("__tv").as("__t"),
        sum("__wv").as("__w"))
      .select(col("n"), col("lo_cut"), col("p_lo"), col("p_hi"),
        expr("CAST((1000000 * __s) div n AS BIGINT)").as("mean_micro"),
        expr("""CAST(CASE WHEN n - 2 * lo_cut > 0
               | THEN (1000000 * __t) div (n - 2 * lo_cut)
               | ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("trimmed_mean_micro"),
        expr("CAST((1000000 * __w) div n AS BIGINT)")
          .as("winsorized_mean_micro"))
  }

  /**
   * Difference-in-differences over a 2×2 (treated × post) design with
   * integer-quantized outcomes: did = (ȳ_T,post − ȳ_T,pre) −
   * (ȳ_C,post − ȳ_C,pre), where each cell mean is the exact FLOORED
   * micro mean (10⁶·Σ div n) — so the estimate is a pure integer
   * difference of four deterministic cell statistics, replayable
   * bit-for-bit. The causal-inference companion to [[cuped]]: CUPED
   * shrinks variance, DiD removes group-constant and time-constant
   * confounding.
   *
   * Output: one row (n_tpre, n_tpost, n_cpre, n_cpost, m_tpre, m_tpost,
   * m_cpre, m_cpost, did_micro) — means in micro units of the input
   * grid.
   */
  def diffInDiff(
      df: DataFrame, treatedCol: String, postCol: String,
      yCol: String): DataFrame = {
    def cell(t: Boolean, p: Boolean, what: String) = Seq(
      sum(when(col(treatedCol) === t && col(postCol) === p, 1L)
        .otherwise(0L)).as(s"n_$what"),
      sum(when(col(treatedCol) === t && col(postCol) === p, col(yCol))
        .otherwise(0L).cast("decimal(38,0)")).as(s"s_$what"))
    val cells =
      cell(true, false, "tpre") ++ cell(true, true, "tpost") ++
        cell(false, false, "cpre") ++ cell(false, true, "cpost")
    val m = df.agg(cells.head, cells.tail: _*)
    def mean(w: String) =
      expr(s"CAST(CASE WHEN n_$w > 0 THEN (1000000 * s_$w) div n_$w " +
        s"ELSE 0 END AS BIGINT)").as(s"m_$w")
    m.select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
        mean("tpre"), mean("tpost"), mean("cpre"), mean("cpost"))
      .select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
        col("m_tpre"), col("m_tpost"), col("m_cpre"), col("m_cpost"),
        (col("m_tpost") - col("m_tpre") - col("m_cpost") + col("m_cpre"))
          .as("did_micro"))
  }

  // Benford first-digit screening lives in [[BenfordAudit]]
  // (Expectations.scala) — one module for both card shapes and both
  // digit extractions; `orders_benford` uses BenfordAudit.screenCard.

  // Resampling inference lives in [[Bootstrap]] — one module for
  // the Poisson bootstrap (poissonBootstrap / poissonBootstrapCi),
  // the paired sign-flip permutationTest, and the two-sample
  // label-randomization twoSampleRandomizationTest; the
  // events_permutation_test / events_bootstrap_ci rows use those.

  /**
   * A/B power card: the minimal detectable effect (two-sided α = 5%,
   * power 80%) for a two-sample mean comparison at the OBSERVED group
   * sizes and pooled variance —
   *
   *   MDE = (z₀.₉₇₅ + z₀.₈) · √(s²_pooled · (1/n_a + 1/n_b))
   *
   * with the fixed public constants 1.959964 + 0.841621. Variance
   * sums are exact DECIMAL; the one sqrt runs on those integers in a
   * fixed order, rounded to 6 dp. The "is this experiment even big
   * enough" gate before anyone reads a p-value.
   *
   * Output: one row (n_a, n_b, pooled_var, mde) in input-grid units.
   */
  def abPower(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val m = df.filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(groupCol) === a, col(valueCol)).otherwise(0L)
          .cast("decimal(38,0)")).as("__sa"),
        sum(when(col(groupCol) === b, col(valueCol)).otherwise(0L)
          .cast("decimal(38,0)")).as("__sb"),
        sum(when(col(groupCol) === a,
          expr(s"CAST($valueCol AS DECIMAL(38,0)) * $valueCol"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("__saa"),
        sum(when(col(groupCol) === b,
          expr(s"CAST($valueCol AS DECIMAL(38,0)) * $valueCol"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("__sbb"))
    m.select(col("n_a"), col("n_b"),
        expr("""round((CAST(CAST(n_a AS DECIMAL(38,0)) * __saa - __sa * __sa AS DOUBLE)
               | / n_a + CAST(CAST(n_b AS DECIMAL(38,0)) * __sbb - __sb * __sb AS DOUBLE)
               | / n_b) / (n_a + n_b - 2), 6)"""
          .stripMargin.replace("\n", " ")).as("pooled_var"))
      .select(col("n_a"), col("n_b"), col("pooled_var"),
        expr("""round(2.801585 * sqrt(pooled_var *
               | (1.0 / n_a + 1.0 / n_b)), 6)"""
          .stripMargin.replace("\n", " ")).as("mde"))
  }

}
