package graft.operators

import graft.SparkFunSuite

/** LSH calibration card: the S-curve arithmetic against independent
  * math.pow truth, monotonicity, and the knee behavior the 8×4
  * defaults are chosen for. */
class LshCalibrationSpec extends SparkFunSuite {
  import spark.implicits._

  test("detect_prob matches independent pow() truth to 6 decimals") {
    // identical twin docs -> jaccard 1.0; sibling pairs at lower s
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta iota kappa"))
      .toDF("doc_id", "text")
    val got = Dedup.lshCalibration(docs, "doc_id", "text",
      blockLen = 16, threshold = 0.3, bands = 8, rowsPerBand = 4)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        ((r.getAs[Long]("jacc_micro"), r.getAs[Double]("detect_prob"))))
      .toMap
    got.foreach { case (_, (jm, dp)) =>
      val s = jm / 1e6
      val want = 1.0 - math.pow(1.0 - math.pow(s, 4), 8)
      assert(math.abs(dp - want) < 1e-6, s"jm=$jm dp=$dp want=$want")
    }
    assert(got((1L, 2L))._1 === 1000000L) // exact dup
    assert(got((1L, 2L))._2 === 1.0)
  }

  test("the 8x4 knee: s=0.9 is near-certain, s=0.5 is a coin flip-ish") {
    def prob(s: Double): Double =
      1.0 - math.pow(1.0 - math.pow(s, 4), 8)
    assert(prob(0.9) > 0.999)
    assert(prob(0.5) > 0.3 && prob(0.5) < 0.5)
    assert(prob(0.2) < 0.02)
  }

  test("deterministic under repartition") {
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} common words here plus tok${i % 5} tail"))
      .toDF("doc_id", "text")
    val a = Dedup.lshCalibration(docs, "doc_id", "text", 16, 0.3, 8, 4)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    val b = Dedup.lshCalibration(docs.repartition(9), "doc_id", "text",
      16, 0.3, 8, 4)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
