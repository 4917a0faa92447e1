package graft.operators

import graft.SparkFunSuite

class QualityClassifierSpec extends SparkFunSuite {
  import spark.implicits._

  /** Mixed corpus: fluent stopword-rich prose vs short/punct junk. */
  private def corpus(n: Int) = {
    val good = "the quick brown fox and the lazy dog of the meadow ran over " +
      "the hill and the valley and the stream of the forest all day long"
    (0 until n).map { i =>
      if (i % 4 == 0) (i.toLong, s"@@@ ### $i !!")
      else (i.toLong, s"$good $i")
    }.toDF("doc_id", "text")
  }

  test("fit: micro-integer weights are partitioning-invariant (bit-exact)") {
    val df = corpus(120)
    val a = QualityClassifier.fit(df.repartition(7), "doc_id", "text", iters = 5)
    val b = QualityClassifier.fit(df.repartition(2), "doc_id", "text", iters = 5)
    assert(a.wMicro.toSeq === b.wMicro.toSeq)
    assert(a.bMicro === b.bMicro)
    assert(a.mean.toSeq === b.mean.toSeq && a.sd.toSeq === b.sd.toSeq)
  }

  test("trained model separates junk from prose (better than majority class)") {
    val df = corpus(200)
    val m = QualityClassifier.fit(df, "doc_id", "text")
    val scored = QualityClassifier.score(df, "doc_id", "text", m)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2), r.getLong(3)))
    val neg = scored.filter(_._3 == 0L).map(_._1)
    val pos = scored.filter(_._3 == 1L).map(_._1)
    assert(neg.nonEmpty && pos.nonEmpty)
    assert(neg.max < pos.min, "score ranges should separate cleanly here")
    val tnr = scored.count(s => s._3 == 0L && !s._2).toDouble / neg.length
    val tpr = scored.count(s => s._3 == 1L && s._2).toDouble / pos.length
    assert((tnr + tpr) / 2 > 0.9, s"balanced accuracy tnr=$tnr tpr=$tpr")
  }

  test("fitSummary exposes the exact model integers") {
    val df = corpus(60)
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 4)
    val row = QualityClassifier.fitSummary(df, "doc_id", "text", iters = 4).collect()(0)
    assert(row.getLong(0) === m.n && row.getLong(1) === m.nPos)
    assert(Seq(row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5)) ===
      m.wMicro.toSeq)
    assert(row.getLong(6) === m.bMicro)
  }

  test("constant feature falls back to sd=1 (no NaN/Inf anywhere)") {
    // identical docs → every feature variance is exactly 0
    val df = (0L until 30L).map(i => (i, "same text every time ok")).toDF("doc_id", "text")
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 3)
    assert(m.sd.forall(_ == 1.0))
    val scores = QualityClassifier.score(df, "doc_id", "text", m)
      .collect().map(_.getDouble(1))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
  }

  test("class weights derive from label counts (weighted mean is balanced)") {
    val df = corpus(100) // 25 junk / 75 prose
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 1)
    assert(m.nPos === 75L && m.n === 100L)
    assert(m.posWeight === 25 * 2.0 / 100 && m.negWeight === 75 * 2.0 / 100)
  }

  // ----------------------------------------------------- calibration

  test("calibration: perfectly calibrated bins have zero gap and zero ECE") {
    import spark.implicits._
    // bin 2 (score .25): 1 of 4 positive -> frac_pos 0.25 == mean_pred
    // bin 7 (score .75): 3 of 4 positive
    val scored = (Seq.fill(3)((0.25, 0L)) ++ Seq((0.25, 1L)) ++
      Seq.fill(3)((0.75, 1L)) ++ Seq((0.75, 0L)))
      .toDF("score", "rule_label")
    val out = QualityClassifier.calibration(scored, "score", "rule_label")
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(2, 7))
    out.foreach { r =>
      assert(r.getAs[Double]("gap") === 0.0)
      assert(r.getAs[Double]("ece") === 0.0)
      assert(r.getAs[Long]("n") === 4L)
    }
  }

  test("calibration: hand-computed miscalibration and weighted ECE") {
    import spark.implicits._
    // bin 9: predicted 0.9 but only half positive -> gap -0.4
    // bin 0: predicted 0.05, all negative -> gap -0.05
    // (NB 0.1 would land in bin 1: 0.1 * 10 == 1.0000000000000002 in
    // IEEE doubles — identically in Spark and the SQL oracle)
    val scored = (Seq((0.9, 1L), (0.9, 0L)) ++ Seq.fill(2)((0.05, 0L)))
      .toDF("score", "rule_label")
    val out = QualityClassifier.calibration(scored, "score", "rule_label")
      .orderBy("bin").collect()
    val byBin = out.map(r => r.getInt(0) -> r).toMap
    assert(byBin(0).getAs[Double]("gap") === -0.05)
    assert(byBin(9).getAs[Double]("gap") === -0.4)
    assert(byBin(9).getAs[Double]("mean_pred") === 0.9)
    assert(byBin(9).getAs[Double]("frac_pos") === 0.5)
    // ECE = (2*0.05 + 2*0.4) / 4 = 0.225
    assert(out.head.getAs[Double]("ece") === 0.225)
  }

  test("calibration: score 1.0 clamps into the top bin") {
    import spark.implicits._
    val scored = Seq((1.0, 1L), (0.0, 0L)).toDF("score", "rule_label")
    val bins = QualityClassifier.calibration(scored, "score", "rule_label")
      .orderBy("bin").collect().map(_.getInt(0)).toSeq
    assert(bins === Seq(0, 9))
  }

  test("isotonic: PAV pools the violator pair, endpoints untouched") {
    import spark.implicits._
    // 20-bin grid: bins 0..3 with rates .25, 1.0, 0.0, 1.0 (weights
    // 4,2,2,2) — bins 1 and 2 violate monotonicity and pool to
    // (2+0)/(2+2) = 0.5; hand minimax: iso = .25, .5, .5, 1.0
    val scored = (
      Seq.fill(3)((0.01, 0L)) ++ Seq((0.01, 1L)) ++
        Seq.fill(2)((0.06, 1L)) ++
        Seq.fill(2)((0.11, 0L)) ++
        Seq.fill(2)((0.16, 1L))).toDF("score", "rule_label")
    val out = QualityClassifier.isotonic(scored, "score", "rule_label")
      .collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))) === Array(
      (0, 4L, 1L, 250000L, 250000L),
      (1, 2L, 2L, 1000000L, 500000L),
      (2, 2L, 0L, 0L, 500000L),
      (3, 2L, 2L, 1000000L, 1000000L)))
    // monotone by construction
    val iso = out.map(_.getLong(4))
    assert(iso.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("isotonic: already-monotone rates are a fixed point") {
    import spark.implicits._
    val scored = (Seq.fill(4)((0.01, 0L)) ++
      Seq((0.26, 0L), (0.26, 1L)) ++
      Seq.fill(2)((0.51, 1L))).toDF("score", "rule_label")
    val out = QualityClassifier.isotonic(scored, "score", "rule_label")
      .collect()
    assert(out.map(r => (r.getInt(0), r.getLong(3), r.getLong(4))) ===
      Array((0, 0L, 0L), (5, 500000L, 500000L), (10, 1000000L, 1000000L)))
  }

  test("platt: smoothed targets exact; slope positive on separable scores; deterministic") {
    import spark.implicits._
    val scored = (Seq.fill(4)((0.1, 0L)) ++ Seq.fill(4)((0.9, 1L)))
      .toDF("score", "rule_label")
    val r = QualityClassifier.plattSummary(scored, "score", "rule_label")
      .collect().head
    assert(r.getLong(0) === 8L && r.getLong(1) === 4L)
    // t+ = 5/6, t− = 1/6 on the truncated micro grid
    assert(r.getLong(2) === 833333L)
    assert(r.getLong(3) === 166666L)
    // scores separate the classes → positive slope, and σ(A·s̄+B)
    // orders the two groups correctly
    val a = r.getLong(4); val b = r.getLong(5)
    assert(a > 0L, s"a_micro=$a")
    def sig(s: Double) = 1.0 / (1.0 + math.exp(-(a / 1e6 * s + b / 1e6)))
    assert(sig(0.9) > sig(0.1))
    // integral state ⇒ bit-identical refit
    val r2 = QualityClassifier.plattSummary(scored, "score", "rule_label")
      .collect().head
    assert(r2.toSeq === r.toSeq)
  }

  test("brier decomposition: hand case, identity holds exactly") {
    import spark.implicits._
    // two per bin with constant in-bin forecasts: p=0.1 (y: 0,1) and
    // p=0.9 (y: 1,1). Hand-computed micro values:
    //   brier = 0.21, rel = 0.085, res = 0.0625, unc = 0.1875
    //   and 0.085 - 0.0625 + 0.1875 = 0.21 (identity exact here)
    val scored = Seq((0.1, 0L), (0.1, 1L), (0.9, 1L), (0.9, 1L))
      .toDF("score", "rule_label")
    val r = QualityClassifier
      .brierDecomposition(scored, "score", "rule_label", bins = 2)
      .collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 210000L)
    assert(r.getLong(2) === 85000L)
    assert(r.getLong(3) === 62500L)
    assert(r.getLong(4) === 187500L)
    assert(r.getLong(2) - r.getLong(3) + r.getLong(4) === r.getLong(1))
  }

  test("brier decomposition: perfect confident classifier → all zero but unc") {
    import spark.implicits._
    val scored = Seq((1.0, 1L), (1.0, 1L), (0.0, 0L), (0.0, 0L))
      .toDF("score", "rule_label")
    val r = QualityClassifier
      .brierDecomposition(scored, "score", "rule_label")
      .collect().head
    // brier 0, reliability 0, resolution = uncertainty = 0.25
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 250000L)
    assert(r.getLong(4) === 250000L)
  }
}
