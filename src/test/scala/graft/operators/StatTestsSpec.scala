package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkFunSuite {

  import spark.implicits._

  test("ksTwoSample: hand-computed max ECDF gap") {
    // A = {1,2,3}, B = {3,4}; pooled grid 1,2,3,4:
    //   Ca = 1,2,3,3  Cb = 0,0,1,2  |Ca·2 − Cb·3| = 2,4,3,0 → max 4
    //   D = 4/(3·2) = 0.666666…  → 666666 floored micro
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = StatTests.ksTwoSample(df, "g", "v", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (3L, 2L, 666666L))
  }

  test("ksTwoSample: identical samples score 0") {
    val df = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val r = StatTests.ksTwoSample(df, "g", "v", "a", "b").collect().head
    assert(r.getLong(2) === 0L)
  }

  test("ksTwoSample: deterministic across partitionings") {
    val base = (1 to 500).map(i => (if (i % 3 == 0) "a" else "b", (i * 7 % 101).toLong))
    val r1 = StatTests.ksTwoSample(base.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head.toSeq
    val r2 = StatTests.ksTwoSample(base.toDF("g", "v").repartition(13), "g", "v",
      "a", "b").collect().head.toSeq
    assert(r1 === r2)
  }

  test("wasserstein1: hand-computed area between step ECDFs") {
    // A = {0,10}, B = {5,15}: grid 0,5,10,15, gaps 5,5,5;
    // |Ca·2 − Cb·2| = 2,0,2,0 → area 2·5 + 0 + 2·5 = 20 → W1 = 20/4 = 5
    val df = Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 15L)).toDF("g", "v")
    val r = StatTests.wasserstein1(df, "g", "v", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (2L, 2L, 5000000L))
  }

  test("wasserstein1: a constant shift moves exactly that distance") {
    val a = Seq(1L, 7L, 9L).map(("a", _))
    val b = Seq(1L, 7L, 9L).map(v => ("b", v + 3L))
    val r = StatTests.wasserstein1((a ++ b).toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    assert(r.getLong(2) === 3000000L)
    // identical samples → 0
    val same = StatTests.wasserstein1(
      (a ++ a.map(x => ("b", x._2))).toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    assert(same.getLong(2) === 0L)
  }

  test("wasserstein1: bucketWidth is a performance knob, never semantics") {
    val df = (0 until 60).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, ((i * 37L + 11) % 40) * 13L)
    }.toDF("g", "v")
    val wide = StatTests.wasserstein1(df, "g", "v", "a", "b",
      bucketWidth = 1000L).collect().head
    val narrow = StatTests.wasserstein1(df.repartition(7), "g", "v", "a", "b",
      bucketWidth = 7L).collect().head
    assert(wide.getLong(2) === narrow.getLong(2))
    assert((wide.getLong(0), wide.getLong(1)) === (30L, 30L))
  }

  test("quantileShift: hand-computed quartiles of a pure location shift") {
    // A = {10,20,30,40}, B = A + 5, quartiles: ranks ⌈q·4/4⌉ = 1,2,3,4
    val a = Seq(10L, 20L, 30L, 40L).map(("a", _))
    val b = a.map { case (_, v) => ("b", v + 5L) }
    val got = StatTests.quantileShift((a ++ b).toDF("g", "v"),
      "g", "v", "a", "b", quantiles = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, 10L, 15L, 5L), (2L, 20L, 25L, 5L),
      (3L, 30L, 35L, 5L), (4L, 40L, 45L, 5L)))
  }

  test("quantileShift: a tail-only change moves only the top rows") {
    val a = Seq(1L, 2L, 3L, 4L).map(("a", _))
    val b = Seq(1L, 2L, 3L, 400L).map(("b", _))
    val got = StatTests.quantileShift((a ++ b).toDF("g", "v"),
      "g", "v", "a", "b", quantiles = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 396L)))
  }

  test("psi: identical distributions score exactly 0") {
    val df = (1 to 100).flatMap(i => Seq(("r", i.toLong), ("c", i.toLong)))
      .toDF("g", "v")
    val r = StatTests.psi(df, "g", "v", "r", "c").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (100L, 100L, 0L))
  }

  test("psi: a shifted distribution scores positive; out-of-range clamps") {
    val ref = (1 to 100).map(i => ("r", i.toLong))
    val cmp = (1 to 100).map(i => ("c", i.toLong + 200)) // all above ref max
    val r = StatTests.psi((ref ++ cmp).toDF("g", "v"), "g", "v", "r", "c")
      .collect().head
    assert(r.getLong(2) > 0L)
  }

  test("mannWhitney: hand case without ties") {
    // A = {1,2}, B = {3,4}: R_a = 3, U = 4 + 3 − 3 = 4 → u2 = 8
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = StatTests.mannWhitney(df, "g", "v", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (2L, 2L, 8L))
    // U = 4, μ = 2, σ² = (4/12)·(5 − 0/12) = 5/3 → z = 2/sqrt(5/3)
    assert(r.getDouble(3) === math.rint(2.0 / math.sqrt(4.0 / 12 * 5) * 1e6) / 1e6)
  }

  test("mannWhitney: midrank ties stay integral (doubled ranks)") {
    // A = {1,1}, B = {1,2}: value 1 has t=3, less=0 → doubled midrank 4
    //   R2a = 2·4 = 8; u2 = 2·2·2 + 2·3 − 8 = 6 (U = 3; μ = 2)
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val r = StatTests.mannWhitney(df, "g", "v", "a", "b").collect().head
    assert(r.getLong(2) === 6L)
  }

  test("spearman: monotone pairs score exactly ±1; constant scores 0") {
    val up = (1 to 40).map(i => (i.toLong, i.toLong * i)).toDF("x", "y")
    val r1 = StatTests.spearmanCard(up, "x", "y").collect().head
    assert((r1.getLong(0), r1.getDouble(1)) === (40L, 1.0))
    val down = (1 to 40).map(i => (i.toLong, 100L - i)).toDF("x", "y")
    assert(StatTests.spearmanCard(down, "x", "y")
      .collect().head.getDouble(1) === -1.0)
    val const = (1 to 10).map(i => (i.toLong, 7L)).toDF("x", "y")
    assert(StatTests.spearmanCard(const, "x", "y")
      .collect().head.getDouble(1) === 0.0)
  }

  test("spearman: midrank ties match the textbook tied-rank formula") {
    // x = (1,2,2,4), y = (10,20,20,40): x ranks (1, 2.5, 2.5, 4) = y
    // ranks → ρ = 1 even though neither ranking is strict
    val df = Seq((1L, 10L), (2L, 20L), (2L, 20L), (4L, 40L)).toDF("x", "y")
    val r = StatTests.spearmanCard(df, "x", "y").collect().head
    assert(r.getDouble(1) === 1.0)
    // hand case WITH a disagreeing tie: x = (1,2,3), y = (5,5,9):
    // y midranks (1.5, 1.5, 3) → doubled (3,3,6); x doubled (2,4,6)
    // Sxy = 3·(2·3+4·3+6·6) − 12·12 = 18; Sxx = 3·56 − 144 = 24;
    // Syy = 3·54 − 144 = 18 → ρ = 18/sqrt(24·18)
    val d2 = Seq((1L, 5L), (2L, 5L), (3L, 9L)).toDF("x", "y")
    val want = math.rint(18.0 / math.sqrt(24.0 * 18.0) * 1e6) / 1e6
    assert(StatTests.spearmanCard(d2, "x", "y")
      .collect().head.getDouble(1) === want)
  }

  test("spearman: invariant under strictly monotone transforms of either side") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 60).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val a = StatTests.spearmanCard(base.toDF("x", "y"), "x", "y")
      .collect().head.getDouble(1)
    val b = StatTests.spearmanCard(
      base.map { case (x, y) => (x * 7 + 3, y * y * 2 + y) }.toDF("x", "y"),
      "x", "y").collect().head.getDouble(1)
    assert(a === b, "rank correlation must see only the order")
  }

  test("cuped: a perfectly predictive covariate removes all variance") {
    val units = (1 to 50).map(i => (i.toLong, i.toLong * 3, i.toLong * 6))
      .toDF("u", "x", "y")
    val r = StatTests.cuped(units, "x", "y").collect().head
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 2.0)     // theta = Sxy/Sxx = 2
    assert(r.getDouble(3) === 0.0)     // var_adj = 0
    assert(r.getLong(4) === 1000000L)  // 100% variance reduction
  }

  test("cuped: an exactly balanced covariate gives theta 0 and no reduction") {
    // every y level appears with x = +1 and x = −1 equally → Sxy = 0
    val units = (for {
      y <- 0L to 3L; x <- Seq(1L, -1L); rep <- 1 to 5
    } yield (y * 100 + x * 10 + rep, x, y)).toDF("u", "x", "y")
    val r = StatTests.cuped(units, "x", "y").collect().head
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === r.getDouble(3)) // var unchanged
    assert(r.getLong(4) === 0L)
  }

  test("robustMean: hand-computed trim and winsorization kill the whale") {
    // values 1..9 plus a 100 whale; 20% trim → lo = 2, keep ranks 3..8
    val df = ((1L to 9L) :+ 100L).toDF("v")
    val r = StatTests.robustMean(df, "v", trimPct = 20).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("lo_cut") === 2L)
    assert(r.getAs[Long]("p_lo") === 3L)
    assert(r.getAs[Long]("p_hi") === 8L)
    assert(r.getAs[Long]("mean_micro") === 14500000L)
    assert(r.getAs[Long]("trimmed_mean_micro") === 5500000L)   // mean 3..8
    assert(r.getAs[Long]("winsorized_mean_micro") === 5500000L)
  }

  test("robustMean: tied values split across the trim boundary exactly") {
    // 1,2,2,2,9 with 20% trim → lo = 1, keep ranks 2..4 → three 2s
    val df = Seq(1L, 2L, 2L, 2L, 9L).toDF("v")
    val r = StatTests.robustMean(df, "v", trimPct = 20).collect().head
    assert(r.getAs[Long]("trimmed_mean_micro") === 2000000L)
    assert(r.getAs[Long]("p_lo") === 2L && r.getAs[Long]("p_hi") === 2L)
    assert(r.getAs[Long]("winsorized_mean_micro") === 2000000L)
  }

  test("diffInDiff: hand-computed 2×2 cell means and the difference") {
    val df = Seq(
      (true, false, 10L), (true, false, 20L), // treated pre: mean 15
      (true, true, 40L),                      // treated post: mean 40
      (false, false, 5L),                     // control pre: mean 5
      (false, true, 10L), (false, true, 20L)) // control post: mean 15
      .toDF("t", "p", "y")
    val r = StatTests.diffInDiff(df, "t", "p", "y").collect().head
    assert(r.getAs[Long]("m_tpre") === 15000000L)
    assert(r.getAs[Long]("m_tpost") === 40000000L)
    assert(r.getAs[Long]("m_cpre") === 5000000L)
    assert(r.getAs[Long]("m_cpost") === 15000000L)
    // (40 − 15) − (15 − 5) = 15
    assert(r.getAs[Long]("did_micro") === 15000000L)
  }

  test("abPower: hand-computed pooled variance and MDE") {
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val r = StatTests.abPower(df, "g", "v", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) === (2L, 3L))
    // SS_a = 2, SS_b = 0 → pooled = 2/3
    assert(r.getDouble(2) === 0.666667)
    val want = math.rint(2.801585 *
      math.sqrt(0.666667 * (1.0 / 2 + 1.0 / 3)) * 1e6) / 1e6
    assert(r.getDouble(3) === want)
  }

  test("cumulative block gate: too-wide domains refuse loudly") {
    val df = (1 to 50000).map(i => ("a", i.toLong * 100000)).toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      StatTests.ksTwoSample(df, "g", "v", "a", "b", bucketWidth = 1L,
        maxBlocks = 64).collect()
    }
    assert(ex.getMessage.contains("blocks exceed"))
  }

  test("benfordCard: hand-counted digits, exclusions, exact shares") {
    val spark0 = spark
    import spark0.implicits._
    // digits: 1 (from 1, 10, 199), 9 (from 9), 2 (from 25);
    // 0, negatives and NULL are excluded
    val vals = Seq(Some(1L), Some(10L), Some(199L), Some(9L), Some(25L),
      Some(0L), Some(-7L), None)
    val got = BenfordAudit.screenCard(vals.toDF("v"), "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === (1L to 9L).toSet)
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === 600000L)                 // 3/5
    assert(got(1L)._4 === (600000L - 301030L))     // |share - benford|
    assert(got(2L)._1 === 1L && got(2L)._2 === 200000L)
    assert(got(9L)._1 === 1L)
    assert(got(3L)._1 === 0L && got(3L)._2 === 0L)
    assert(got(3L)._4 === 124939L)                 // empty digit: dev = benford
  }

  test("benfordCard: a geometric (Benford-ideal) series lands near the law") {
    val spark0 = spark
    import spark0.implicits._
    // powers of 2 are the textbook Benford sequence (leading 15
    // digits keep the value in a Long; the first digit is unchanged)
    val vals = (0 until 200).map(i => BigInt(2).pow(i).toString.take(15).toLong)
    val got = BenfordAudit.screenCard(vals.toDF("v"), "v").collect()
    got.foreach { r =>
      assert(r.getLong(4) < 40000L, s"digit ${r.getLong(0)} dev ${r.getLong(4)}")
    }
  }
}
