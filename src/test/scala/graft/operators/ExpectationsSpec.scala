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

  // -------------------------------------------------------- Benford

  test("benford: first digits from magnitude bands; sub-1 and non-positive excluded") {
    import spark.implicits._
    val df = Seq(123456.0, 500.0, 5.9, 1.0, 9.99, 0.5, 0.0, -3.0)
      .toDF("v")
    val out = BenfordAudit.benfordCard(df, "v").collect()
    val byDigit = out.map(r => r.getInt(0) -> r.getAs[Long]("n_obs")).toMap
    assert(byDigit(1) === 2L) // 123456, 1.0
    assert(byDigit(5) === 2L) // 500, 5.9
    assert(byDigit(9) === 1L) // 9.99
    assert((2 to 4).map(byDigit(_)).sum + byDigit(6) + byDigit(7) + byDigit(8) === 0L)
    assert(out.head.getAs[Long]("n_excluded") === 3L) // 0.5, 0, -3
    assert(out.head.getAs[Long]("n_total") === 5L)
    assert(out.length === 9) // all 9 digits present even when unobserved
  }

  test("benford: chi-square matches a hand computation (micro-integer sum)") {
    import spark.implicits._
    val df = Seq.fill(30)(1.0) ++ Seq.fill(70)(9.0)
    val out = BenfordAudit.benfordCard(df.toDF("v"), "v").collect()
    val n = 100.0
    val expected = BenfordAudit.P.zipWithIndex.map { case (p, i) =>
      val obs = if (i == 0) 30.0 else if (i == 8) 70.0 else 0.0
      math.round((obs - p * n) * (obs - p * n) / (p * n) * 1e6)
    }.sum / 1e6
    assert(math.abs(out.head.getAs[Double]("chi2") -
      math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("benford: a Benford-ish geometric sample scores far lower than a uniform one") {
    import spark.implicits._
    // powers of 2 are classic Benford-conformant; uniform 100..999 is not
    val benfordish = (0 until 200).map(i => math.pow(2.0, i % 29 + 1)).toDF("v")
    val uniform = (0 until 200).map(i => 100.0 + (i * 4.5)).toDF("v")
    val cb = BenfordAudit.benfordCard(benfordish, "v").collect().head.getAs[Double]("chi2")
    val cu = BenfordAudit.benfordCard(uniform, "v", maxExp = 4).collect().head.getAs[Double]("chi2")
    assert(cb < cu, s"benford-ish $cb should beat uniform $cu")
  }
}
