package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the Deequ/Great-Expectations
 * pattern as a single Spark aggregate: a training-data drop is gated
 * on a constraint suite (completeness, uniqueness, domains, ranges,
 * formats) BEFORE it enters the corpus, and the verdict card is the
 * artifact reviewers sign off on.
 *
 * Scale shape (100 TB): every row-local rule compiles to one
 * `sum(when(violation, 1))` column inside ONE hash-free global
 * aggregate — the whole suite is a single scan with map-side partials,
 * regardless of how many rules it carries. Uniqueness rules add a
 * `count distinct` (Spark plans expand + two-phase agg in the same
 * pass). The result is ONE wide row, exploded driver-free into the
 * per-rule verdict card — nothing but the k-rule card ever leaves the
 * executors. Pass/fail thresholds compare INTEGER counts (violations ≤
 * maxViolations), so the verdict is exact — no float fraction drifts
 * at a 10¹¹-row denominator.
 */
object Expectations {

  sealed trait Rule {
    def check: String
    def column: String
    def maxViolations: Long
  }

  /** Row-local predicate rule: `violation` marks a failing row. */
  final case class RowRule(
      check: String, column: String, violation: Column,
      maxViolations: Long = 0L) extends Rule

  /** Uniqueness rule: violations = non-null rows − distinct non-null
    * values (0 when every present value is unique). */
  final case class UniqueRule(
      check: String, column: String, maxViolations: Long = 0L) extends Rule

  /** Run the suite: one aggregate pass → one verdict row per rule:
    * (check, column, violations, total, passed). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    val aggs = rules.zipWithIndex.map {
      case (RowRule(_, _, v, _), i) =>
        sum(when(v, 1L).otherwise(0L)).as(s"__v$i")
      case (UniqueRule(_, c, _), i) =>
        (count(col(c)) - countDistinct(col(c))).as(s"__v$i")
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val verdicts = rules.zipWithIndex.map { case (r, i) =>
      val v = coalesce(col(s"__v$i"), lit(0L)) // empty input → 0 violations
      struct(
        lit(r.check).as("check"),
        lit(r.column).as("column"),
        v.as("violations"),
        col("__total").as("total"),
        (v <= r.maxViolations).as("passed"))
    }
    wide.select(explode(array(verdicts: _*)).as("e")).select("e.*")
  }
}

/**
 * Benford first-significant-digit audit — the classic anomaly screen
 * for value columns (prices, revenues, counts): natural multi-scale
 * data follows P(d) = log10(1 + 1/d); fabricated, truncated, or
 * unit-capped feeds do not, so a large chi-square statistic flags a
 * source worth inspecting BEFORE it trains anything. Routine in
 * financial-data QA (Nigrini); here it joins the data-quality rows
 * (expectations, drift, outlier fences) as a one-scan audit card.
 *
 * Determinism discipline (bit-exact vs the SQL oracle):
 *  - the first digit comes from a magnitude-band CASE (floor(v/10^k)
 *    for the band holding v) — pure double arithmetic both engines
 *    share; no log10, no cast-to-string (whose formatting is
 *    engine-specific);
 *  - the expected probabilities are literals from [[BenfordAudit.P]],
 *    precomputed once here (the only place log10 runs) and
 *    interpolated into the oracle SQL — one source of truth;
 *  - the chi-square statistic is summed as per-digit MICRO-integer
 *    contributions (round(contrib * 1e6) as BIGINT), so the 9-term
 *    sum is exact and partition-order independent.
 *
 * One aggregate scan to 9 rows; the statistic is a broadcast
 * join-back of a 1-row aggregate. Values ≤ 0 are excluded (Benford
 * is defined on positive magnitudes) and reported via n_excluded.
 *
 * This object is the engine's ONE home for the law: both card shapes
 * and both digit extractions live here (the r14 verdict flagged the
 * same-named duplicate that briefly lived in StatTests).
 *  - [[benfordCard]] — the chi-square AUDIT card over arbitrary
 *    positive doubles: magnitude-band CASE digit extraction (doubles
 *    have no exact decimal string, so the band fold is the
 *    engine-portable path), explicit exclusion accounting, one χ²
 *    verdict column. Drives `audit_benford`.
 *  - [[screenCard]] — the share/deviation SCREEN card over
 *    caller-quantized positive integers (cents, micros): first digit
 *    via the decimal string's first character (exact on the integer
 *    grid where the band fold's double divisions would risk boundary
 *    ulps), per-digit |share − expectation| in integral micros.
 *    Drives `orders_benford`.
 * Both read their expectations from [[P]]/[[MicroP]] — one constants
 * table, two documented renderings.
 */
object BenfordAudit {

  /** log10(1 + 1/d) for d = 1..9 — the cross-engine literal table. */
  val P: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** The same table on the 6-dp micro grid: round(1e6 · log10(1+1/d))
    * — the rendering the integer-exact [[screenCard]] compares against
    * (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
    * 45757). */
  val MicroP: Seq[Long] = P.map(p => math.round(p * 1e6))

  /** Magnitude bands covering (0, 10^maxExp): first digit of v =
    * floor(v / 10^k) for the k with 10^k <= v < 10^(k+1). */
  private def firstDigit(v: Column, maxExp: Int): Column = {
    // ascending fold so the LARGEST band ends up outermost — the CASE
    // must test v >= 10^(maxExp-1) before v >= 10^(maxExp-2), etc.
    // Values at or above 10^maxExp are EXCLUDED (null), not mis-binned
    // (and under ANSI mode a huge floor would overflow the int cast).
    val banded = (1 until maxExp).foldLeft(
      when(v >= 1, floor(v)).otherwise(lit(null))) { (rest, k) =>
      when(v >= math.pow(10.0, k), floor(v / lit(math.pow(10.0, k))))
        .otherwise(rest)
    }
    when(v >= math.pow(10.0, maxExp), lit(null)).otherwise(banded).cast("int")
  }

  /** SQL rendering of the same band CASE — the oracle half. */
  def firstDigitSql(vExpr: String, maxExp: Int): String = {
    val bands = (maxExp - 1 to 1 by -1).map { k =>
      s"WHEN $vExpr >= 1e$k THEN CAST(floor($vExpr / 1e$k) AS INT)"
    }
    (s"WHEN $vExpr >= 1e$maxExp THEN NULL" +: bands :+
      s"WHEN $vExpr >= 1 THEN CAST(floor($vExpr) AS INT)")
      .mkString("CASE ", " ", " ELSE NULL END")
  }

  /**
   * The audit card: per digit (1..9) observed count, expected
   * probability and count, micro-exact chi-square contribution, plus
   * the total statistic and the sub-1 / non-positive exclusion count
   * as constant columns. `maxExp`: values >= 10^maxExp are excluded
   * like non-positives (counted in n_excluded) — size it to the
   * column.
   */
  def benfordCard(df: DataFrame, valueCol: String, maxExp: Int = 9): DataFrame = {
    val v = col(valueCol).cast("double")
    val digits = df.select(
      when(v >= 1, firstDigit(v, maxExp)).otherwise(lit(null)).as("digit"))
    val obs = digits.filter(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val excluded = digits.agg(
      sum(when(col("digit").isNull, 1L).otherwise(0L)).as("n_excluded"),
      sum(when(col("digit").isNotNull, 1L).otherwise(0L)).as("n_total"))
    val spark = df.sparkSession
    import spark.implicits._
    val expect = P.zipWithIndex.map { case (p, i) => (i + 1, p) }
      .toDF("digit", "p_expected")
    val perDigit = expect.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(excluded))
      .withColumn("n_expected", round(col("p_expected") * col("n_total"), 6))
      .withColumn("chi2_micro",
        round((col("n_obs") - col("p_expected") * col("n_total")) *
          (col("n_obs") - col("p_expected") * col("n_total")) /
          (col("p_expected") * col("n_total")) * 1e6).cast("long"))
    val chi2 = perDigit.agg(sum("chi2_micro").as("cm"))
      .select(round(col("cm") / 1e6, 6).as("chi2"))
    perDigit
      .crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"), round(col("p_expected"), 6).as("p_expected"),
        col("n_expected"), col("n_total"), col("n_excluded"), col("chi2"))
      .orderBy("digit")
  }

  /**
   * The share/deviation SCREEN card (see the object scaladoc for the
   * split vs [[benfordCard]]): first digit of a positive integer-grid
   * value (caller quantizes — cents, micros) as the first character
   * of its decimal string — engine-portable where `log10`-based
   * extraction risks boundary ulps; shares are integral micro
   * divisions against [[MicroP]]. One count aggregate; the digit grid
   * is 9 rows.
   *
   * Output: (digit, n, share_micro, benford_micro, dev_micro) for
   * d = 1..9, ordered by digit.
   */
  def screenCard(df: DataFrame, valueCol: String): DataFrame = {
    // filter on the CAST integer, not the raw value: a fractional
    // value in (0, 1) would pass a raw > 0 check, truncate to digit
    // 0, silently fall off the 1–9 grid and still inflate the share
    // denominator — the digit and the filter must see the same number
    val counts = df
      .select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val expected = MicroP.zipWithIndex
      .map { case (m, i) => (i + 1L, m) }.toDF("digit", "benford_micro")
    val tot = counts.agg(sum("n").as("__t"))
    expected.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("""CASE WHEN __t > 0
               | THEN (1000000 * CAST(n AS DECIMAL(38,0))) div __t
               | ELSE 0 END""".stripMargin.replace("\n", " "))
          .as("share_micro"),
        col("benford_micro"))
      .withColumn("dev_micro", abs(col("share_micro") - col("benford_micro")))
      .orderBy("digit")
  }
}
