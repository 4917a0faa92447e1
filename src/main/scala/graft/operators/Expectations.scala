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
