package graft.operators

import java.sql.Timestamp
import java.time.Instant

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/**
 * Event-series cards: the CUSUM closed form pinned against the
 * SEQUENTIAL Page recurrence it replaces (the property that justifies
 * computing a recurrence with a window), MAD flags vs direct lower
 * medians, zero-filled grid semantics, seasonal shares, and partition
 * invariance.
 */
class EventSeriesSpec extends SparkFunSuite {
  import spark.implicits._

  /** (type, dayOffset) pairs → an events frame; day 0 = 2024-01-01. */
  private val Day0 = 19723L // days 1970-01-01 → 2024-01-01
  private def ev(rows: Seq[(String, Int)], hour: Int = 12) =
    rows.map { case (t, d) =>
      (Timestamp.from(Instant.ofEpochSecond(
        (Day0 + d) * 86400L + hour * 3600L)), t)
    }.toDF("ts", "event_type")

  test("cusum hand case: a level shift peaks S+ at the shift") {
    // type x: 1/day for 4 days then 3/day for 4 days (shift at day 4)
    val rows = (0 until 4).map(d => Seq("x" -> d)) ++
      (4 until 8).map(d => Seq.fill(3)("x" -> d))
    val got = EventSeries.cusumChangepoint(ev(rows.flatten)).collect().head
    // grid: 1,1,1,1,3,3,3,3 → mean = 2 (16/8), dev µ: -1,-1,-1,-1,1,1,1,1
    // P: -1,-2,-3,-4,-3,-2,-1,0 → S+ peaks at day 7 (P−minP = 4), S− at day 3
    assert(got.getString(0) === "x")
    assert(got.getLong(1) === 8L)           // n_days
    assert(got.getLong(2) === 16L)          // total
    assert(got.getLong(3) === 2000000L)     // mean_micro
    assert(got.getLong(4) === 4000000L)     // cusum_pos_micro
    assert(got.getLong(5) === Day0 + 7)     // cp_day_pos
    assert(got.getLong(6) === 4000000L)     // cusum_neg_micro
    assert(got.getLong(7) === Day0 + 3)     // cp_day_neg
  }

  test("grid zero-fills: a type silent mid-span still covers every day") {
    // y exists on days 0 and 5 only; x spans 0..5 → y's grid has 6 days
    val rows = (0 to 5).map(d => "x" -> d) ++ Seq("y" -> 0, "y" -> 5)
    val got = EventSeries.cusumChangepoint(ev(rows))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("x" -> 6L, "y" -> 6L))
    val mad = EventSeries.madAnomalies(ev(rows), k = 1).collect()
    // y: counts 1,0,0,0,0,1 → med 0, mad 0, days 0 and 5 flagged at k=1
    val yDays = mad.filter(_.getString(0) == "y").map(_.getLong(1)).toSeq
    assert(yDays === Seq(Day0, Day0 + 5))
  }

  test("property: windowed closed form ≡ sequential Page recurrence") {
    val genSeries = for {
      n <- Gen.chooseNum(1, 20)
      counts <- Gen.listOfN(n, Gen.chooseNum(0, 5))
    } yield counts
    val prop = Prop.forAll(genSeries) { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)("t" -> d)
      }
      if (rows.isEmpty) true // no events → empty grid, nothing to check
      else {
        // dense grid over the OBSERVED span only (min..max day present)
        val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
        val xs = (lo to hi).map(d => counts(d).toLong)
        val n = xs.size.toLong
        val total = xs.sum
        val mean = 1000000L * total / n
        // sequential recurrence (the definition)
        var sp = 0L; var sn = 0L
        var bestP = Long.MinValue; var bestPd = -1L
        var bestN = Long.MinValue; var bestNd = -1L
        xs.zipWithIndex.foreach { case (x, i) =>
          val dev = 1000000L * x - mean
          sp = math.max(0L, sp + dev)
          sn = math.max(0L, sn - dev)
          if (sp > bestP) { bestP = sp; bestPd = lo + i }
          if (sn > bestN) { bestN = sn; bestNd = lo + i }
        }
        val got = EventSeries.cusumChangepoint(ev(rows).repartition(3))
          .collect().head
        got.getLong(1) == n && got.getLong(2) == total &&
          got.getLong(3) == mean &&
          got.getLong(4) == bestP && got.getLong(5) == Day0 + bestPd &&
          got.getLong(6) == bestN && got.getLong(7) == Day0 + bestNd
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: madAnomalies ≡ direct lower-median reference") {
    val genSeries = for {
      n <- Gen.chooseNum(1, 15)
      counts <- Gen.listOfN(n, Gen.chooseNum(0, 6))
    } yield counts
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.size + 1) / 2 - 1)
    }
    val prop = Prop.forAll(genSeries) { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)("t" -> d)
      }
      if (rows.isEmpty) true
      else {
        val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
        val xs = (lo to hi).map(d => counts(d).toLong)
        val med = lowerMedian(xs)
        val mad = lowerMedian(xs.map(x => math.abs(x - med)))
        val k = 2
        val want = xs.zipWithIndex.collect {
          case (x, i) if 1000000L * math.abs(x - med) / math.max(mad, 1L)
            >= k * 1000000L =>
            (Day0 + lo + i, x, med, mad,
              1000000L * math.abs(x - med) / math.max(mad, 1L))
        }
        val got = EventSeries.madAnomalies(ev(rows).repartition(3), k = k)
          .collect().map(r =>
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5))).toSeq
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("seasonality: dense 24-hour grid, exact shares, peak flags") {
    // 3 events at hour 12, 1 at hour 5
    val df = ev(Seq(("a", 0), ("a", 0), ("a", 0)), hour = 12)
      .unionByName(ev(Seq(("a", 0)), hour = 5))
    val got = EventSeries.seasonalProfile(df).collect()
    assert(got.length === 24)
    val byHr = got.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byHr(12L) === ((3L, 750000L, true)))
    assert(byHr(5L) === ((1L, 250000L, false)))
    assert(byHr(0L) === ((0L, 0L, false)))
    assert(got.count(_.getBoolean(4)) === 1)
  }

  test("deterministic under repartitioning") {
    val rows = (0 until 40).map(i => (if (i % 3 == 0) "a" else "b", i % 7))
    val a = EventSeries.cusumChangepoint(ev(rows).repartition(1))
      .collect().map(_.toSeq).toSeq
    val b = EventSeries.cusumChangepoint(ev(rows).repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
