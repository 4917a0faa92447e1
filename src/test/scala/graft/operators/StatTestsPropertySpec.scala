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

  // ---- round-14 extension: the same randomized-parity discipline
  // ---- for every remaining card in the family (the r13 verdict ask)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("property: ksTwoSample ≡ direct max-ECDF-gap definition") {
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val na = a.size.toLong; val nb = b.size.toLong
      val mx = (a ++ b).distinct.map { v =>
        BigInt(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na).abs
      }.max
      (BigInt(1000000) * mx / (BigInt(na) * nb)).toLong
    }
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val got = StatTests.ksTwoSample(df(a, b).repartition(3),
        "g", "v", "a", "b", bucketWidth = 7L).collect().head
      got.getLong(2) == ref(a, b) &&
        got.getLong(0) == a.size.toLong && got.getLong(1) == b.size.toLong
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: mannWhitney ≡ direct doubled-midrank + tie-corrected z") {
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val na = a.size.toLong; val nb = b.size.toLong; val n = na + nb
      if ((a ++ b).distinct.size < 2) true // z is 0/0, a degenerate input
      else {
        val all = a ++ b
        val r2a = all.distinct.map { v =>
          val less = all.count(_ < v).toLong
          val t = all.count(_ == v).toLong
          BigInt(a.count(_ == v).toLong) * (2 * less + t + 1)
        }.sum
        val u2 = (BigInt(2) * na * nb + BigInt(na) * (na + 1) - r2a).toLong
        val ties = all.distinct.map { v =>
          val t = BigInt(all.count(_ == v).toLong); t * t * t - t
        }.sum
        val z = r6((u2.toDouble / 2 - na.toDouble * nb / 2) /
          math.sqrt(na.toDouble * nb / 12 *
            ((n + 1) - ties.toDouble / (n.toDouble * (n - 1)))))
        val got = StatTests.mannWhitney(df(a, b).repartition(3),
          "g", "v", "a", "b", bucketWidth = 7L).collect().head
        got.getLong(0) == na && got.getLong(1) == nb &&
          got.getLong(2) == u2 && got.getDouble(3) == z
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: psi ≡ direct smoothed-bin log-odds replay") {
    val bins = 5
    def ref(av: Seq[Long], bv: Seq[Long]): (Long, Long, Long) = {
      val lo = av.min; val hi = av.max
      val span = math.max(hi - lo + 1, 1L)
      def binOf(v: Long): Int = {
        // (v - lo) * bins div span, Spark div = truncation toward zero
        val q = (BigInt(v - lo) * bins / span).toLong
        math.min(bins - 1, math.max(0L, q)).toInt
      }
      val cr = Array.fill(bins)(0L); val cc = Array.fill(bins)(0L)
      av.foreach(v => cr(binOf(v)) += 1)
      bv.foreach(v => cc(binOf(v)) += 1)
      val nRef = av.size.toLong; val nCmp = bv.size.toLong
      val bigR = nRef + bins; val bigC = nCmp + bins
      val psi = (0 until bins).map { i =>
        val aTerm = BigInt(cr(i) + 1) * bigC
        val bTerm = BigInt(cc(i) + 1) * bigR
        val lam = BigInt((r6(math.log10(aTerm.toDouble)) * 1e6).round) -
          BigInt((r6(math.log10(bTerm.toDouble)) * 1e6).round)
        (aTerm - bTerm) * lam * 2302585 /
          (BigInt(bigR) * bigC * BigInt("1000000000000"))
      }.sum.toLong
      (nRef, nCmp, psi)
    }
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val got = StatTests.psi(df(a, b).repartition(3),
        "g", "v", "a", "b", bins).collect().head
      (got.getLong(0), got.getLong(1), got.getLong(2)) == ref(a, b)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private val genUnits = for {
    n <- Gen.chooseNum(2, 40)
    xs <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
    ys <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
  } yield xs.zip(ys)

  test("property: cuped ≡ direct moment-form replay") {
    val prop = Prop.forAll(genUnits) { units =>
      val n = units.size.toLong
      val sx = BigInt(units.map(_._1).sum)
      val sy = BigInt(units.map(_._2).sum)
      val sxx = units.map(u => BigInt(u._1) * u._1).sum
      val sxy = units.map(u => BigInt(u._1) * u._2).sum
      val syy = units.map(u => BigInt(u._2) * u._2).sum
      val bSxx = BigInt(n) * sxx - sx * sx
      val bSxy = BigInt(n) * sxy - sx * sy
      val bSyy = BigInt(n) * syy - sy * sy
      val theta =
        if (bSxx > 0) r6(bSxy.toDouble / bSxx.toDouble) else 0.0
      val n3 = n.toDouble * n * n
      val varY = r6(bSyy.toDouble / n3)
      val varAdj = r6((bSyy.toDouble - 2.0 * theta * bSxy.toDouble +
        theta * theta * bSxx.toDouble) / n3)
      val red =
        if (varY > 0)
          BigDecimal((1.0 - varAdj / varY) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else 0L
      val got = StatTests.cuped(
        units.toDF("x", "y").repartition(3), "x", "y").collect().head
      got.getLong(0) == n && got.getDouble(1) == theta &&
        got.getDouble(2) == varY && got.getDouble(3) == varAdj &&
        got.getLong(4) == red
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private val genPanel = for {
    n <- Gen.chooseNum(4, 60)
    rows <- Gen.listOfN(n, for {
      t <- Gen.oneOf(true, false)
      p <- Gen.oneOf(true, false)
      y <- Gen.chooseNum(-1000L, 1000L)
    } yield (t, p, y))
  } yield rows

  test("property: diffInDiff ≡ direct four-cell floored-mean replay") {
    // Spark div truncates toward zero on negative sums — BigInt / agrees
    val prop = Prop.forAll(genPanel) { rows =>
      def cell(t: Boolean, p: Boolean): (Long, Long) = {
        val ys = rows.filter(r => r._1 == t && r._2 == p).map(_._3)
        val nC = ys.size.toLong
        val m =
          if (nC == 0) 0L
          else (BigInt(1000000) * BigInt(ys.sum) / nC).toLong
        (nC, m)
      }
      val (ntpre, mtpre) = cell(t = true, p = false)
      val (ntpost, mtpost) = cell(t = true, p = true)
      val (ncpre, mcpre) = cell(t = false, p = false)
      val (ncpost, mcpost) = cell(t = false, p = true)
      val got = StatTests.diffInDiff(
        rows.toDF("treated", "post", "y").repartition(3),
        "treated", "post", "y").collect().head
      (0 to 8).map(got.getLong) == Seq(ntpre, ntpost, ncpre, ncpost,
        mtpre, mtpost, mcpre, mcpost,
        mtpost - mtpre - mcpost + mcpre)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private val genPower = for {
    na <- Gen.chooseNum(2, 40)
    nb <- Gen.chooseNum(2, 40)
    a <- Gen.listOfN(na, Gen.chooseNum(-1000L, 1000L))
    b <- Gen.listOfN(nb, Gen.chooseNum(-1000L, 1000L))
  } yield (a, b)

  test("property: abPower ≡ direct pooled-variance MDE replay") {
    val prop = Prop.forAll(genPower) { case (a, b) =>
      val na = a.size.toLong; val nb = b.size.toLong
      val sa = BigInt(a.sum); val sb = BigInt(b.sum)
      val saa = a.map(v => BigInt(v) * v).sum
      val sbb = b.map(v => BigInt(v) * v).sum
      val pooled = r6(((BigInt(na) * saa - sa * sa).toDouble / na +
        (BigInt(nb) * sbb - sb * sb).toDouble / nb) / (na + nb - 2))
      val mde = r6(2.801585 *
        math.sqrt(pooled * (1.0 / na + 1.0 / nb)))
      val got = StatTests.abPower(df(a, b).repartition(3),
        "g", "v", "a", "b").collect().head
      got.getLong(0) == na && got.getLong(1) == nb &&
        got.getDouble(2) == pooled && got.getDouble(3) == mde
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private val genWeighted = for {
    n <- Gen.chooseNum(1, 60)
    k <- Gen.chooseNum(1, 15)
    ws <- Gen.listOfN(n, Gen.chooseNum(1L, 1000L))
  } yield (ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }, k)

  test("property: priorityEstimate ≡ direct DLT threshold-estimator replay") {
    def u16(seed: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16)
    }
    val prop = Prop.forAll(genWeighted) { case (rows, k) =>
      val pri = rows.map { case (id, w) =>
        (id, w, w * 65536L / (u16("graft", id) + 1L))
      }
      val topK1 = pri.sortBy { case (id, _, q) => (-q, id) }.take(k + 1)
      val tau = if (topK1.size <= k) 0L else topK1.map(_._3).min
      val est = topK1.take(k).map { case (_, w, _) => math.max(w, tau) }.sum
      val truth = rows.map(_._2).sum
      val relErr = 1000000L * math.abs(est - truth) / truth
      val got = DatasetSplit.priorityEstimate(
        rows.toDF("id", "w").repartition(3), "id", "w", k).collect().head
      got.getLong(0) == k.toLong && got.getLong(1) == rows.size.toLong &&
        got.getLong(2) == truth && got.getLong(3) == est &&
        got.getLong(4) == relErr
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- the shared block-scan guard every drift card rides

  test("property: twoSampleRandomizationTest ≡ direct seeded-md5-rank replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val genUnits = for {
      n <- Gen.chooseNum(2, 30)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        y <- Gen.chooseNum(-500L, 500L)
      } yield (g, y))
    } yield rows.zipWithIndex.map { case ((g, y), i) => (i.toLong, g, y) }
    val trials = 37
    val prop = Prop.forAll(genUnits) { units =>
      val na = units.count(_._2 == "a").toLong
      val nb = units.count(_._2 == "b").toLong
      val sa = BigInt(units.filter(_._2 == "a").map(_._3).sum)
      val sb = BigInt(units.filter(_._2 == "b").map(_._3).sum)
      val st = sa + sb
      val dObs = (sa * nb - sb * na).abs
      val nGe = (1 to trials).count { t =>
        val ranked = units
          .sortBy(u => (md5hex(s"perm:42:$t:${u._1}"), u._1.toString))
        val sat = BigInt(ranked.take(na.toInt).map(_._3).sum)
        (sat * nb - (st - sat) * na).abs >= dObs
      }.toLong
      val got = Bootstrap.twoSampleRandomizationTest(
        units.toDF("unit", "g", "y").repartition(3),
        "g", "y", "a", "b", "unit", trials = trials).collect().head
      got.getLong(0) == na && got.getLong(1) == nb &&
        got.getLong(2) == dObs.toLong && got.getLong(3) == nGe &&
        got.getLong(4) == 1000000L * (1 + nGe) / (trials + 1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("twoSampleRandomizationTest: constant metric ⇒ p = 1; separated groups ⇒ floor p") {
    // constant y: every randomized |diff| equals the observed 0
    val flat = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 7L)).toDF("unit", "g", "y")
    val g1 = Bootstrap.twoSampleRandomizationTest(flat, "g", "y", "a", "b",
      "unit", trials = 99).collect().head
    assert(g1.getLong(3) === 99L && g1.getLong(4) === 1000000L)
    // fully separated groups: no re-randomization can match d_obs
    // except ones reproducing the exact split — overwhelmingly none
    val sep = ((1L to 10L).map((_, "a", 1000000L)) ++
      (11L to 20L).map((_, "b", 0L))).toDF("unit", "g", "y")
    val g2 = Bootstrap.twoSampleRandomizationTest(sep, "g", "y", "a", "b",
      "unit", trials = 99).collect().head
    assert(g2.getLong(3) <= 1L)
    assert(g2.getLong(4) <= 20000L) // ≤ (1+1)/100 on the micro grid
    // validation
    intercept[IllegalArgumentException] {
      Bootstrap.twoSampleRandomizationTest(flat, "g", "y", "a", "b", "unit",
        trials = 0)
    }
  }

  test("property: poissonBootstrapCi ≡ direct hash16/PoissonCum replay") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def mult(u: Long, rep: Long): Long = {
      val hv = Integer.parseInt(md5hex(s"$u:$rep").take(4), 16).toLong
      Bootstrap.PoissonCum.indexWhere(hv < _) match {
        case -1 => 8L
        case k  => k.toLong
      }
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val genUnits = for {
      n <- Gen.chooseNum(1, 25)
      ys <- Gen.listOfN(n, Gen.chooseNum(-500L, 500L))
    } yield ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
    val reps = 40 // a multiple of 40: the double-ceil trap rank
    val prop = Prop.forAll(genUnits) { units =>
      val means = (0L until reps.toLong).flatMap { rep =>
        val ws = units.map { case (u, y) => (mult(u, rep), y) }
        val n = ws.map(_._1).sum
        if (n == 0) None
        else Some((rep, r6(ws.map { case (w, y) => w * y }.sum.toDouble / n)))
      }
      val got = Bootstrap.poissonBootstrapCi(
        units.toDF("unit", "y").repartition(3), "unit", "y",
        reps = reps).collect()
      val tN = means.size.toLong
      if (tN == 0) got.isEmpty
      else {
        // rank by (mean, rep) — the value at the ceil ranks
        val sorted = means.sortBy { case (rep, m) => (m, rep) }.map(_._2)
        val lo = sorted(((tN * 25 + 999) / 1000 - 1).toInt)
        val hi = sorted(((tN * 975 + 999) / 1000 - 1).toInt)
        val meanObs = r6(units.map(_._2).sum.toDouble / units.size)
        val r = got.head
        got.length == 1 && r.getLong(0) == units.size.toLong &&
          r.getLong(1) == tN && r.getDouble(2) == meanObs &&
          r.getDouble(3) == lo && r.getDouble(4) == hi
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("poissonBootstrapCi: interval brackets the mean; validation") {
    val units = (1L to 60L).map(i => (i, 1000L + (i % 7) * 10))
      .toDF("unit", "y")
    val r = Bootstrap.poissonBootstrapCi(units, "unit", "y", reps = 199)
      .collect().head
    assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4),
      s"CI [${r.getDouble(3)}, ${r.getDouble(4)}] vs mean ${r.getDouble(2)}")
    intercept[IllegalArgumentException] {
      Bootstrap.poissonBootstrapCi(units, "unit", "y", reps = 0)
    }
  }

  test("property: results are bucketWidth-invariant (KS, W1, MW on widths 1/7/1000)") {
    val prop = Prop.forAll(genSamples) { case (a, b) =>
      val d = df(a, b).repartition(3)
      def row(f: Long => org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        Seq(1L, 7L, 1000L).map(w => f(w).collect().head.toSeq)
      row(w => StatTests.ksTwoSample(d, "g", "v", "a", "b", w))
        .distinct.size == 1 &&
        row(w => StatTests.wasserstein1(d, "g", "v", "a", "b", w))
          .distinct.size == 1 &&
        ((a ++ b).distinct.size < 2 ||
          row(w => StatTests.mannWhitney(d, "g", "v", "a", "b", w))
            .distinct.size == 1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("cumulativeOverValue refuses loudly exactly beyond maxBlocks") {
    val spark0 = spark
    import spark0.implicits._
    def hist(m: Int) = (0 until m).map(v => (v.toLong, 1L)).toDF("__v", "__c")
    // m values at width 1 = m blocks: at the bound runs, beyond refuses
    val m = 64
    val ok = StatTests.cumulativeOverValue(
      hist(m), "__v", Seq("__c"), bucketWidth = 1L, maxBlocks = m)
      .orderBy("__v").collect()
    assert(ok.length == m && ok.last.getLong(2) == m.toLong)
    val e = intercept[IllegalArgumentException] {
      StatTests.cumulativeOverValue(
        hist(m), "__v", Seq("__c"), bucketWidth = 1L, maxBlocks = m - 1)
    }
    assert(e.getMessage.contains("exceed"))
    // negative values: `div` truncation still buckets deterministically
    val neg = Seq(-3L, -2L, -1L, 0L, 1L).map((_, 1L)).toDF("__v", "__c")
    val cum = StatTests.cumulativeOverValue(
      neg, "__v", Seq("__c"), bucketWidth = 2L, maxBlocks = 16)
      .orderBy("__v").collect().map(_.getLong(2)).toSeq
    assert(cum == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("property: robustMean ≡ direct trimmed/winsorized reference") {
    val genVals = for {
      n <- Gen.chooseNum(1, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(-5000L, 5000L))
    } yield xs
    val prop = Prop.forAll(genVals) { xs =>
      val n = xs.size.toLong
      val lo = n * 5 / 100
      val sorted = xs.sorted
      val pLo = sorted(lo.toInt)                 // q(lo+1)
      val pHi = sorted((n - lo).toInt - 1)       // q(n-lo)
      val mean = BigInt(1000000) * BigInt(xs.sum) / n
      val kept = sorted.slice(lo.toInt, (n - lo).toInt)
      val trimmed =
        if (kept.nonEmpty) BigInt(1000000) * BigInt(kept.sum) / kept.size
        else BigInt(0)
      val wins = BigInt(1000000) *
        BigInt(sorted.map(v => math.min(math.max(v, pLo), pHi)).sum) / n
      val got = StatTests.robustMean(
        xs.zipWithIndex.map(_.swap).toDF("i", "v").repartition(3),
        "v", trimPct = 5, bucketWidth = 7L).collect().head
      got.getLong(0) == n && got.getLong(1) == lo &&
        got.getLong(2) == pLo && got.getLong(3) == pHi &&
        got.getLong(4) == mean.toLong &&
        got.getLong(5) == trimmed.toLong &&
        got.getLong(6) == wins.toLong
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: spearmanCard ≡ direct midrank-Pearson replay (ties everywhere)") {
    // tight value range on purpose: heavy ties exercise the doubled
    // midranks, and bucketWidth 7 exercises block boundaries
    val genPairs = for {
      n <- Gen.chooseNum(2, 50)
      xs <- Gen.listOfN(n, Gen.chooseNum(-20L, 20L))
      ys <- Gen.listOfN(n, Gen.chooseNum(-20L, 20L))
    } yield xs.zip(ys)
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      cnt.keys.map { v =>
        val less = vs.count(_ < v).toLong
        v -> (2 * less + cnt(v) + 1)
      }.toMap
    }
    val prop = Prop.forAll(genPairs) { pairs =>
      val (xs, ys) = pairs.unzip
      val rx = ranks2(xs); val ry = ranks2(ys)
      val a = xs.map(rx); val b = ys.map(ry)
      val n = BigInt(pairs.size)
      def dot(u: Seq[Long], v: Seq[Long]) =
        u.zip(v).map { case (p, q) => BigInt(p) * q }.sum
      val sxx = n * dot(a, a) - BigInt(a.sum) * BigInt(a.sum)
      val sxy = n * dot(a, b) - BigInt(a.sum) * BigInt(b.sum)
      val syy = n * dot(b, b) - BigInt(b.sum) * BigInt(b.sum)
      val want =
        if (sxx > 0 && syy > 0)
          math.rint(sxy.toDouble /
            math.sqrt(sxx.toDouble * syy.toDouble) * 1e6) / 1e6
        else 0.0
      val got = StatTests.spearmanCard(
        pairs.toDF("x", "y").repartition(3), "x", "y", bucketWidth = 7L)
        .collect().head
      got.getLong(0) == pairs.size.toLong && got.getDouble(1) == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
