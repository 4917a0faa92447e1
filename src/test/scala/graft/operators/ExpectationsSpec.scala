package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Expectation suite: per-rule verdict semantics (row rules, unique
  * rules, thresholds, null handling), single-aggregate plan shape, and
  * empty-input totality. */
class ExpectationsSpec extends SparkFunSuite {
  import spark.implicits._
  import Expectations._

  private val df = Seq(
    (1L, Some("a"), 10),
    (2L, Some("b"), -3),
    (2L, None, 5),
    (4L, Some("b"), 0)
  ).toDF("id", "tag", "x")

  test("row rules count violating rows; zero-tolerance verdicts") {
    val card = validate(df, Seq(
      RowRule("x_nonneg", "x", col("x") < 0),
      RowRule("tag_not_null", "tag", col("tag").isNull))).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(card("x_nonneg") === ((1L, 4L, false)))
    assert(card("tag_not_null") === ((1L, 4L, false)))
  }

  test("unique rule: dup non-null values counted, nulls don't violate") {
    val card = validate(df, Seq(
      UniqueRule("id_unique", "id"),
      UniqueRule("tag_unique", "tag"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(card("id_unique") === ((1L, false))) // id=2 twice
    assert(card("tag_unique") === ((1L, false))) // "b" twice; null ignored
  }

  test("maxViolations threshold flips the verdict, not the count") {
    val card = validate(df, Seq(
      RowRule("x_nonneg_tol", "x", col("x") < 0, maxViolations = 1),
      UniqueRule("id_unique_tol", "id", maxViolations = 5))).collect()
    assert(card.forall(_.getBoolean(4)))
    assert(card.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("empty input: zero violations, zero total, all rules pass") {
    val card = validate(df.filter(col("id") < 0), Seq(
      RowRule("x_nonneg", "x", col("x") < 0),
      UniqueRule("id_unique", "id"))).collect()
    assert(card.length === 2)
    assert(card.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getBoolean(4)))
  }

  test("plan: the whole suite is ONE aggregate over ONE scan") {
    val plan = validate(df, Seq(
      RowRule("a", "x", col("x") < 0),
      RowRule("b", "tag", col("tag").isNull),
      RowRule("c", "id", col("id") > 100),
      UniqueRule("d", "id")))
      .queryExecution.executedPlan.toString
    // one distinct-expand aggregate chain, no join, no extra exchange
    assert(!plan.contains("Join"))
    assert(plan.sliding("LocalTableScan".length).count(_ == "LocalTableScan") <= 1)
  }
}
