package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/** Krippendorff's alpha (nominal): hand-computed coincidence-matrix
  * case, unpairable-unit exclusion, perfect/undefined agreement
  * edges, and randomized parity with a direct in-memory replay of the
  * documented 1e-12-grid convention. */
class KrippendorffSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    Evaluation.krippendorffAlpha(
      rows.toDF("unit", "rating").repartition(3), "unit", "rating")
      .collect().head

  test("hand case: one disagreeing pair among three pairable units") {
    // u1: a,a  u2: a,b  u3: b,b  u4: b (unpairable, drops)
    val got = run(Seq(
      (1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L), (3L, 1L), (4L, 1L)))
    // n=6, S = 1e12·2 (u2's two ordered disagreeing pairs / (2−1)),
    // De = 36 − (3² + 3²) = 18 → α = 1 − 5·2e12/(1e12·18) = 4/9
    assert(got.getLong(0) === 3L)             // n_units
    assert(got.getLong(1) === 6L)             // n_ratings
    assert(got.getLong(2) === 2000000000000L) // do_scaled
    assert(got.getLong(3) === 18L)            // de_pairs
    assert(got.getDouble(4) === 0.444444)
  }

  test("perfect agreement across categories: alpha = 1") {
    val got = run(Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L)))
    assert(got.getLong(2) === 0L)
    assert(got.getDouble(4) === 1.0)
  }

  test("single category everywhere: expected disagreement 0, alpha NULL") {
    val got = run(Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 2L)))
    assert(got.getLong(3) === 0L)
    assert(got.isNullAt(4))
  }

  test("three raters with a systematic deviant: below-chance alpha, exact") {
    // every unit rated (0,0,1): d_u = 6−2 = 4, term 2e12 each →
    // D_o = 2/3 while the skewed marginals give D_e = 400/870, so
    // α = 1 − 29·2e13/(1e12·400) = −0.45 — systematic disagreement
    // reads WORSE than chance, the property that separates α from
    // raw percent agreement
    val rows = (1L to 10L).flatMap(u => Seq((u, 0L), (u, 0L), (u, 1L)))
    val got = run(rows)
    assert(got.getLong(1) === 30L)
    assert(got.getDouble(4) === -0.45)
  }

  test("property: alpha ≡ direct coincidence-matrix replay (1e-12 grid)") {
    val genRatings = for {
      nUnits <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(nUnits * 3, for {
        u <- Gen.chooseNum(1, nUnits)
        keep <- Gen.chooseNum(0, 3) // 25% missing
        v <- Gen.chooseNum(0L, 2L)
      } yield if (keep == 0) None else Some((u.toLong, v)))
    } yield rows.flatten
    val prop = Prop.forAll(genRatings) { rows =>
      val byUnit = rows.groupBy(_._1).filter(_._2.size >= 2)
      if (byUnit.isEmpty) {
        val got = run(rows)
        got.getLong(0) == 0L && got.isNullAt(4)
      } else {
        val s = byUnit.values.map { rs =>
          val mu = rs.size.toLong
          val agree2 = rs.groupBy(_._2).values
            .map(g => g.size.toLong * (g.size - 1)).sum
          BigInt("1000000000000") * (mu * (mu - 1) - agree2) / (mu - 1)
        }.sum
        val n = byUnit.values.map(_.size.toLong).sum
        val nc = byUnit.values.flatten.groupBy(_._2).values
          .map(_.size.toLong)
        val de2 = n * n - nc.map(c => c * c).sum
        val got = run(rows)
        val okCore = got.getLong(0) == byUnit.size.toLong &&
          got.getLong(1) == n && got.getLong(2) == s.toLong &&
          got.getLong(3) == de2
        val okAlpha =
          if (de2 > 0) {
            val want = BigDecimal(
              1.0 - ((n - 1).toDouble * s.toDouble) / (1.0e12 * de2.toDouble))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            got.getDouble(4) == want
          } else got.isNullAt(4)
        okCore && okAlpha
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
