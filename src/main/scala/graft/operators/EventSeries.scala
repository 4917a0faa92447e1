package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-series drift and anomaly cards over the daily/hourly count
 * grid — the monitoring layer a training-data pipeline runs on its
 * ingestion streams: did a source's volume SHIFT (CUSUM changepoint,
 * Page 1954), which days are OUTLIERS (median/MAD flags, the robust
 * z-score), and what is the NORMAL intraday shape (seasonal profile).
 * Beyond-reference scope (the reference has no event data at all);
 * complements [[StatTests]] (two-sample drift between snapshots) with
 * single-series structure over time.
 *
 * Package discipline: the corpus reduces FIRST to a dense
 * (type, day) / (type, hour) count grid — one map-side-combinable
 * aggregate; the grid is bounded by calendar span × |types|, a model
 * relation, never corpus-sized (ten years of days is 3 653 rows per
 * type). Every subsequent window runs PARTITIONED by type over that
 * bounded grid; all arithmetic is exact integers on the micro scale,
 * so the DuckDB oracle replays every card bit-for-bit.
 *
 * Zero-count days/hours are IN the grid (a silent day is signal, not
 * a missing row): the span relation is the global [min_day, max_day]
 * sequence crossed with the distinct types — both bounded, both
 * broadcast.
 */
object EventSeries {

  /** Dense (event_type, day, cnt) grid over the global day span —
    * day = days since 1970-01-01 (UTC session zone), zero-filled. */
  private def dayGrid(
      events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val base = events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val counts = base.groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val span = base.agg(min("day").as("__lo"), max("day").as("__hi"))
    val days = span
      .select(explode(expr("sequence(__lo, __hi)")).as("day"))
    val types = base.select("event_type").distinct()
    types.crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /**
   * Two-sided CUSUM changepoint card per event type (Page 1954) over
   * the daily count series, against the series' own mean: with
   * dev_d = 10⁶·x_d − mean_micro and prefix P_d = Σ_{i≤d} dev_i,
   *
   *   S⁺_d = max(0, S⁺_{d−1} + dev_d) = P_d − min(0, min_{j≤d} P_j)
   *   S⁻_d = max(0, S⁻_{d−1} − dev_d) = max(0, max_{j≤d} P_j) − P_d
   *
   * — the prefix-extreme closed form, so the sequential recurrence is
   * one partitioned cumulative window, not a loop. The card reports
   * each side's peak excursion and its day (ties → earliest day), the
   * standard "when did the level shift" diagnostic; thresholding is
   * the caller's policy knob.
   *
   * Output: one row per type (event_type, n_days, total, mean_micro,
   * cusum_pos_micro, cp_day_pos, cusum_neg_micro, cp_day_neg),
   * ordered by event_type. The accumulation is exact DECIMAL; the
   * µ-scaled REPORT columns are BIGINT and share mean_micro's
   * documented ~9·10¹²-events-per-span bound — past it, re-grid the
   * micro scale (the peak is ≤ 10⁶·total by construction).
   */
  def cusumChangepoint(
      events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = dayGrid(events, tsCol, typeCol)
    val tot = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("total"))
      .select(col("event_type"), col("n_days"), col("total"),
        // through DECIMAL: 10⁶·total wraps a LongType once a type
        // passes ~9·10¹² events in the span — silent at ANSI-off
        expr("(1000000 * CAST(total AS DECIMAL(38,0))) div n_days")
          .as("mean_micro"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zero = lit(0).cast("decimal(38,0)")
    val scored = grid
      .join(broadcast(tot), "event_type")
      // deviations and prefixes accumulate in DECIMAL(38,0): the
      // prefix sum of µ-scaled counts exceeds 2⁶³ long before the
      // counts themselves do
      .withColumn("__dev",
        (lit(1000000L) * col("cnt").cast("decimal(38,0)"))
          - col("mean_micro"))
      .withColumn("__p", sum("__dev").over(w))
      .withColumn("__sp", col("__p") - least(zero, min("__p").over(w)))
      .withColumn("__sn", greatest(zero, max("__p").over(w)) - col("__p"))
    scored.groupBy(col("event_type"), col("n_days"), col("total"),
        col("mean_micro"))
      .agg(
        // argmax with earliest-day ties: max on (S, −day)
        max(struct(col("__sp"), (-col("day")).as("__nd"))).as("__mp"),
        max(struct(col("__sn"), (-col("day")).as("__nd"))).as("__mn"))
      .select(col("event_type"), col("n_days"), col("total"),
        col("mean_micro"),
        col("__mp.__sp").cast("long").as("cusum_pos_micro"),
        (-col("__mp.__nd")).as("cp_day_pos"),
        col("__mn.__sn").cast("long").as("cusum_neg_micro"),
        (-col("__mn.__nd")).as("cp_day_neg"))
      .orderBy("event_type")
  }

  /**
   * Median/MAD day-level anomaly card per event type — the robust
   * outlier flag (median absolute deviation, the distribution-free
   * z-score): a day is anomalous iff
   *
   *   10⁶·|x_d − med| div max(mad, 1) ≥ k·10⁶
   *
   * with med = the LOWER median of the daily counts (order statistic
   * at rank (n+1) div 2 — exact integer, no interpolation) and mad =
   * the lower median of |x − med|. max(mad, 1) keeps constant series
   * finite (any deviation from a flat line is then infinitely
   * surprising — flagged at |x−med| ≥ k).
   *
   * Output: the anomalous days only — (event_type, day, cnt, med,
   * mad, score_micro), ordered by (event_type, day).
   */
  def madAnomalies(
      events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val grid = dayGrid(events, tsCol, typeCol)
    val n = Window.partitionBy("event_type")
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wOrd = Window.partitionBy("event_type")
        .orderBy(col(valueCol), col("day"))
      df.withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(n))
        .withColumn(out,
          max(when(col("__rn") === expr("(__n + 1) div 2"), col(valueCol)))
            .over(n))
        .drop("__rn", "__n")
    }
    val withMed = lowerMedian(grid, "cnt", "med")
      .withColumn("__adev", abs(col("cnt") - col("med")))
    val withMad = lowerMedian(withMed, "__adev", "mad")
    withMad
      .withColumn("score_micro",
        expr("(1000000 * CAST(__adev AS DECIMAL(38,0))) div greatest(mad, 1)"))
      .filter(col("score_micro") >= lit(k.toLong) * 1000000L)
      .select(col("event_type"), col("day"), col("cnt"), col("med"),
        col("mad"), col("score_micro"))
      .orderBy("event_type", "day")
  }

  /**
   * Hour-of-day seasonal profile per event type: the dense 24-hour
   * count grid with each hour's exact share of the type's volume and
   * a peak flag — the "what does normal look like" card that makes
   * the two cards above readable (a changepoint at 03:00 on a type
   * that never ships at night is a different incident than one at
   * noon).
   *
   * Output: |types| × 24 rows (event_type, hr, cnt, share_micro,
   * is_peak), share_micro = 10⁶·cnt div type total, is_peak = cnt
   * equals the type's max hour count (ties all flagged — the flag is
   * a property of the count, not a sampled choice), ordered by
   * (event_type, hr).
   */
  def seasonalProfile(
      events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        hour(col(tsCol)).cast("long").as("hr"))
    val counts = base.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"))
    val spark = events.sparkSession
    import spark.implicits._
    val hours = (0L until 24L).toDF("hr")
    val types = base.select("event_type").distinct()
    val grid = types.crossJoin(broadcast(hours))
      .join(counts, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("cnt"))
    val w = Window.partitionBy("event_type")
    grid
      .withColumn("__tot", sum("cnt").over(w))
      .withColumn("__mx", max("cnt").over(w))
      .select(col("event_type"), col("hr"), col("cnt"),
        expr("CASE WHEN __tot > 0 " +
          "THEN (1000000 * CAST(cnt AS DECIMAL(38,0))) div __tot " +
          "ELSE 0 END").as("share_micro"),
        (col("cnt") === col("__mx")).as("is_peak"))
      .orderBy("event_type", "hr")
  }
}
