package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkFunSuite {

  import spark.implicits._

  // deterministic synthetic: y = group base + a seeded residual
  private def synth(n: Int): org.apache.spark.sql.DataFrame =
    (1 to n).map { i =>
      val g = s"g${i % 4}"
      val noise = graft.functions.TextHashKernels.splitMix64(i.toLong) % 21 - 10
      (i.toLong, g, (i % 4) * 1000L + 500L + noise)
    }.toDF("id", "g", "y")

  test("empirical coverage meets the 1 − α guarantee (within sampling slack)") {
    val card = Conformal.card(synth(4000), "id", "g", "y").collect().head
    val coverage = card.getAs[Long]("coverage_micro")
    // guarantee: E[coverage] ≥ 0.9; allow finite-sample slack below
    assert(coverage >= 850000L, s"coverage $coverage")
    assert(card.getAs[Long]("n_cal") > 0 && card.getAs[Long]("n_test") > 0)
    // residuals are within ±10 of the group mean, so q̂ is small
    assert(card.getAs[Long]("qhat") <= 25L)
  }

  test("intervals: lo/hi bracket yhat by exactly qhat; covered ⇔ |y−ŷ| ≤ q̂") {
    val card = Conformal.card(synth(800), "id", "g", "y").collect().head
    val q = card.getAs[Long]("qhat")
    val rows = Conformal.intervals(synth(800), "id", "g", "y").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, yhat, lo, hi, cov) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(hi - yhat === q && yhat - lo === q)
      assert(cov === (math.abs(y - yhat) <= q))
    }
  }

  test("order statistic: hand-computed q̂ on a tiny calibration set") {
    // one group; train mean fixed; residuals on the val split are
    // whatever the md5 split assigns — recompute by hand here
    val df = synth(300)
    val s = DatasetSplit.assignSplits(df, "id")
    val byGroup = s.filter(col("split") === "train")
      .groupBy("g").agg(expr("sum(y) div count(1)").as("yhat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val calScores = s.filter(col("split") === "val")
      .select("g", "y").collect()
      .map(r => math.abs(r.getLong(1) - byGroup(r.getString(0))))
      .sorted
    val nCal = calScores.length
    val r = math.min(((nCal + 1) * 90 + 99) / 100, nCal)
    val want = calScores(r - 1)
    val got = Conformal.card(df, "id", "g", "y").collect().head
    assert(got.getAs[Long]("qhat") === want)
    assert(got.getAs[Long]("n_cal") === nCal.toLong)
    assert(got.getAs[Long]("r") === r.toLong)
  }

  test("unseen test groups are excluded (no predictor, no interval)") {
    // group "zz" appears only with ids that land in the test split:
    // craft by filtering — take synth and relabel test-split rows of g0
    val s = DatasetSplit.assignSplits(synth(2000), "id")
      .withColumn("g2",
        when(col("split") === "test" && col("g") === "g0", "zz")
          .otherwise(col("g")))
      .select(col("id"), col("g2").as("g"), col("y"))
    val rows = Conformal.intervals(s, "id", "g", "y").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getString(1) == "zz"))
  }

  test("alpha validation") {
    intercept[IllegalArgumentException] {
      Conformal.card(synth(100), "id", "g", "y", alphaPct = 0).collect()
    }
  }
}
