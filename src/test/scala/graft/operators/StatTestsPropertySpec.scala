package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/** Randomized ground-truth parity for the drift family: W1 and the
  * quantile-shift table vs direct in-memory definitions over
  * ScalaCheck-generated two-group samples — hand cases pin the
  * formulas, these pin the blocked two-level implementation against
  * every grid/block-boundary interaction the generator can hit
  * (values are drawn across several block widths on purpose). */
class StatTestsPropertySpec extends SparkFunSuite {
  import spark.implicits._

  private val genSamples = for {
    na <- Gen.chooseNum(1, 40)
    nb <- Gen.chooseNum(1, 40)
    // values cross bucket boundaries at width 7 and 1000 alike
    a <- Gen.listOfN(na, Gen.chooseNum(-5000L, 5000L))
    b <- Gen.listOfN(nb, Gen.chooseNum(-5000L, 5000L))
  } yield (a, b)

  private def df(a: Seq[Long], b: Seq[Long]) =
    (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")

  test("property: wasserstein1 ≡ the direct ECDF-area definition") {
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val grid = (a ++ b).distinct.sorted
      val na = a.size.toLong; val nb = b.size.toLong
      var area = BigInt(0)
      grid.sliding(2).foreach {
        case Seq(v, nxt) =>
          val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
          area += BigInt((ca * nb - cb * na).abs) * (nxt - v)
        case _ => ()
      }
      (BigInt(1000000) * area / (BigInt(na) * nb)).toLong
    }
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val got = StatTests.wasserstein1(df(a, b).repartition(3),
        "g", "v", "a", "b", bucketWidth = 7L).collect().head
      got.getLong(2) == ref(a, b) &&
        got.getLong(0) == a.size.toLong && got.getLong(1) == b.size.toLong
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: quantileShift ≡ direct order statistics at rank ⌈q·n/Q⌉") {
    def stat(xs: Seq[Long], q: Long, quantiles: Int): Long = {
      val rank = ((q * xs.size + quantiles - 1) / quantiles).toInt
      xs.sorted.apply(math.max(rank, 1) - 1)
    }
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val quantiles = 5
      val got = StatTests.quantileShift(df(a, b).repartition(3),
        "g", "v", "a", "b", quantiles, bucketWidth = 7L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val want = (1 to quantiles).map { q =>
        val va = stat(a, q.toLong, quantiles)
        val vb = stat(b, q.toLong, quantiles)
        (q.toLong, va, vb, vb - va)
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
