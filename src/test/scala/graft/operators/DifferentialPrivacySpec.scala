package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Geometric-mechanism DP counts: threshold-table invariants against
  * an independent probability computation, noise bounds/determinism,
  * the non-negativity clamp, and the Spark-vs-SQL single source of
  * truth for the inverse CDF. */
class DifferentialPrivacySpec extends SparkFunSuite {
  import spark.implicits._

  test("thresholds: strictly monotone, end at 65536, symmetric around 0") {
    val t = DifferentialPrivacy.thresholds
    assert(t.size === 33)
    assert(t.map(_._1) === (-16 to 16))
    assert(t.sliding(2).forall { case Seq((_, a), (_, b)) => a < b })
    assert(t.last._2 === 65536L)
    // symmetry: P(noise <= -k-1) == P(noise >= k+1), i.e.
    // threshold(-k-1) == 65536 - threshold(k) for the truncated
    // two-sided geometric (up to the 1-ulp rounding of the grid)
    val byK = t.toMap
    (0 until 16).foreach { k =>
      assert(math.abs(byK(-k - 1) - (65536L - byK(k))) <= 1,
        s"k=$k ${byK(-k - 1)} vs ${65536L - byK(k)}")
    }
  }

  test("thresholds match an independently computed truncated-geometric CDF") {
    val alpha = math.exp(-DifferentialPrivacy.Eps)
    val z = (-16 to 16).map(k => math.pow(alpha, math.abs(k))).sum
    var cum = 0.0
    DifferentialPrivacy.thresholds.foreach { case (k, t) =>
      cum += math.pow(alpha, math.abs(k)) / z
      assert(math.abs(t - cum * 65536.0) <= 0.5 + 1e-9, s"k=$k")
    }
  }

  test("noise: bounded, deterministic per key, zero is the modal value") {
    val keys = (0 until 2000).map(i => s"group-$i").toDF("k")
    val out = keys.select(
      DifferentialPrivacy.noise(
        DifferentialPrivacy.u16(col("k"), "dp")).as("noise"))
      .groupBy("noise").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keys.forall(k => k >= -16 && k <= 16))
    val modal = out.maxBy(_._2)._1
    assert(modal === 0L, s"modal noise $modal, hist $out")
    // mean |noise| for eps=0.5 is ~2.1; a gross mis-table would show
    val meanAbs = out.map { case (k, n) => math.abs(k) * n }.sum.toDouble /
      out.values.sum
    assert(meanAbs > 1.0 && meanAbs < 4.0, s"mean|noise| $meanAbs")
  }

  test("noisyCounts: deterministic, clamped at 0, n preserved") {
    val df = Seq.tabulate(40)(i => (s"s${i % 4}", i)).toDF("src", "v")
    val a = DifferentialPrivacy.noisyCounts(df, Seq("src"), "dp")
      .orderBy("src").collect()
    val b = DifferentialPrivacy.noisyCounts(df.repartition(7), Seq("src"), "dp")
      .orderBy("src").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("n") === 10L)
      assert(r.getAs[Long]("noisy_n") ===
        math.max(0L, 10L + r.getAs[Long]("noise")))
      assert(r.getAs[Long]("noisy_n") >= 0L)
    }
    // tiny groups can clamp: count 1 with noise -16 -> 0
    val tiny = Seq(("only", 1)).toDF("src", "v")
    val t = DifferentialPrivacy.noisyCounts(tiny, Seq("src"), "dp")
      .collect().head
    assert(t.getAs[Long]("noisy_n") >= 0L)
  }

  test("seed changes the noise; key encoding is null-safe and unambiguous") {
    val df = Seq.tabulate(400)(i => (s"s$i", i)).toDF("src", "v")
    val a = DifferentialPrivacy.noisyCounts(df, Seq("src"), "dp")
      .select("src", "noise").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = DifferentialPrivacy.noisyCounts(df, Seq("src"), "other-seed")
      .select("src", "noise").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet === b.keySet)
    assert(a.exists { case (k, n) => b(k) != n }, "seed had no effect")
    // ("a:b","c") and ("a","b:c") collide under concat_ws(":") — they
    // must hash differently under the unit-separator encoding
    val amb = Seq(("a:b", "c", 1), ("a", "b:c", 2)).toDF("x", "y", "v")
    val u = amb.select(DifferentialPrivacy.u16(
      DifferentialPrivacy.keyEncoding(Seq("x", "y")), "dp").as("u"))
      .collect().map(_.getLong(0)).toSeq
    assert(u.distinct.size === 2, u)
    // a NULL column yields a key distinct from the empty string's
    val nulls = Seq((Option.empty[String], "c", 1), (Some(""), "c", 2))
      .toDF("x", "y", "v")
    val un = nulls.select(DifferentialPrivacy.u16(
      DifferentialPrivacy.keyEncoding(Seq("x", "y")), "dp").as("u"))
      .collect().map(_.getLong(0)).toSeq
    assert(un.distinct.size === 2, un)
  }

  test("noiseCaseSql carries the identical integer thresholds") {
    val sql = DifferentialPrivacy.noiseCaseSql("u")
    DifferentialPrivacy.thresholds.init.foreach { case (k, t) =>
      assert(sql.contains(s"WHEN u < $t THEN $k"))
    }
    assert(sql.endsWith("ELSE 16 END"))
  }
}
