package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RelationalAnalyticsSpec extends SparkFunSuite {

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$Sf0001/$name.parquet")

  private def executedPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricingSummary: groups complete, averages derive from exact sums") {
    val rows = RelationalAnalytics.pricingSummary(t("lineitem"), "2000-09-01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(r.getAs[Double]("avg_qty") - sumQty / n) < 1e-4 + 1e-9)
      assert(n > 0)
    }
    // results independent of partitioning (exact decimal accumulation)
    val re = RelationalAnalytics.pricingSummary(
      t("lineitem").repartition(13), "2000-09-01").collect()
    assert(rows.map(_.toSeq).toSeq === re.map(_.toSeq).toSeq)
  }

  test("topRevenueOrders: customer broadcast, fact join shuffled, k rows") {
    val df = RelationalAnalytics.topRevenueOrders(
      t("customer"), t("orders"), t("lineitem"), "BUILDING", "1996-03-15", 10)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(df.count() <= 10)
  }

  test("regionalSupplierVolume: dimension chain entirely broadcast") {
    val df = RelationalAnalytics.regionalSupplierVolume(
      t("region"), t("nation"), t("customer"), t("supplier"),
      t("orders"), t("lineitem"), "ASIA", "1996-01-01", "1997-01-01")
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.collect()
    // every output nation must belong to ASIA
    val asiaNations = t("nation")
      .join(t("region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet.subsetOf(asiaNations))
  }

  test("customersWithoutOrders: anti join matches manual set difference") {
    val got = RelationalAnalytics.customersWithoutOrders(
      t("customer"), t("orders"), "1995-01-01", "1995-03-01")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val withOrders = t("orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val all = t("customer").select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(got === all.diff(withOrders))
    assert(got.nonEmpty)
  }

  test("bulkOrderPriorities: semi join counts each order once") {
    val got = RelationalAnalytics.bulkOrderPriorities(t("orders"), t("lineitem"), 45)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = t("orders")
      .join(t("lineitem").filter(col("l_quantity") >= 45)
        .select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    val plan = executedPlan(
      RelationalAnalytics.bulkOrderPriorities(t("orders"), t("lineitem"), 45))
    assert(plan.contains("LeftSemi"), plan)
  }

  test("segmentStatusCube: all four grouping combinations, grand total present") {
    val rows = RelationalAnalytics.segmentStatusCube(t("customer"), t("orders")).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_orders") === t("orders").count())
    // segment-only rows sum to the grand total
    val segOnly = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(segOnly.map(_.getAs[Long]("n_orders")).sum === t("orders").count())
  }

  test("bucketed co-located join plan has no shuffle exchange") {
    val suffix = "spec"
    BucketedStore.writeBucketed(t("lineitem"), s"li_$suffix", "l_orderkey", 4)
    BucketedStore.writeBucketed(t("orders"), s"ord_$suffix", "o_orderkey", 4)
    // disable auto-broadcast: at sf0.001 both sides fit the broadcast
    // threshold, which would bypass (and hide) the bucketed SMJ path
    // that matters at fact⋈fact scale
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joinOnly = spark.table(s"li_$suffix")
        .join(spark.table(s"ord_$suffix"), col("l_orderkey") === col("o_orderkey"))
      val plan = joinOnly.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // and the result equals the plain unbucketed join
      val joined = joinOnly.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plain = t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderstatus").collect().map(_.toSeq).toSeq ===
        plain.orderBy("o_orderstatus").collect().map(_.toSeq).toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("customerOrderDistribution: zero-order customers land in the 0 bucket") {
    import spark.implicits._
    val cust = Seq((1L, "a", 0, 0.0, "B"), (2L, "b", 0, 0.0, "B"),
      (3L, "c", 0, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val got = RelationalAnalytics.customerOrderDistribution(cust, ord)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("skewDiagnostics: hand-computed ratio, ordered heavy keys, one row") {
    import spark.implicits._
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(8L) ++ Seq(9L)).toDF("k")
    val got = RelationalAnalytics.skewDiagnostics(df, "k", k = 2).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("max_freq") === 6L)
    assert(r.getAs[Double]("skew_ratio") === 6.0 * 3.0 / 10.0)
    assert(r.getAs[String]("top_keys") === "7,8")
  }

  test("pricingSummary pushes the shipdate filter and prunes columns at the scan") {
    val df = RelationalAnalytics.pricingSummary(t("lineitem"), "2000-09-01")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("LessThanOrEqual(l_shipdate"), scan)
    // only the 7 referenced columns are read, not the full 11-column row
    assert(!scan.contains("l_orderkey"), scan)
    assert(!scan.contains("l_partkey"), scan)
  }

  test("forecastRevenue (Q6): hand-computed decimal-exact revenue; filters all push to the scan") {
    import spark.implicits._
    val li = Seq(
      // in range, in band, under cap: 100*0.03 + 200*0.02 = 7.0
      ("1996-02-01", 0.03, 10.0, 100.0),
      ("1996-07-15", 0.02, 23.0, 200.0),
      ("1996-03-01", 0.05, 10.0, 400.0), // discount above band
      ("1995-12-31", 0.03, 10.0, 400.0), // before yearStart
      ("1997-01-01", 0.03, 10.0, 400.0), // at yearEnd (exclusive)
      ("1996-06-01", 0.03, 24.0, 400.0)  // at qty cap (exclusive)
    ).toDF("d", "l_discount", "l_quantity", "l_extendedprice")
      .select(col("d").cast("timestamp").as("l_shipdate"),
        col("l_discount"), col("l_quantity"), col("l_extendedprice"))
    val row = RelationalAnalytics.forecastRevenue(
      li, "1996-01-01", "1997-01-01", 0.02, 0.04, 24.0).collect().head
    assert(row.getAs[Double]("revenue") === 7.0)
    assert(row.getAs[Long]("n_rows") === 2L)

    // formatted explain prints the full PushedFilters list (the leaf
    // toString truncates it)
    val scan = RelationalAnalytics.forecastRevenue(
      t("lineitem"), "1996-01-01", "1997-01-01", 0.02, 0.04, 24.0)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scan.contains("GreaterThanOrEqual(l_shipdate"), scan)
    assert(scan.contains("LessThan(l_quantity"), scan)
    assert(scan.contains("GreaterThanOrEqual(l_discount"), scan)
    assert(!scan.contains("l_orderkey"), scan)
  }

  test("returnedItemReport (Q10): only R-flag lineitems in the quarter count; dims broadcast") {
    import spark.implicits._
    val cust = Seq((1L, "alice", 10L, 5.0), (2L, "bob", 11L, 6.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nat = Seq((10L, "DE"), (11L, "FR")).toDF("n_nationkey", "n_name")
    val ord = Seq((100L, 1L, "1996-11-01"), (101L, 2L, "1996-12-01"),
      (102L, 1L, "1997-02-01")) // outside the quarter
      .toDF("o_orderkey", "o_custkey", "d")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"))
    val li = Seq(
      (100L, "R", 100.0, 0.1), // alice: 90
      (100L, "N", 500.0, 0.0), // not returned
      (101L, "R", 200.0, 0.5), // bob: 100
      (102L, "R", 999.0, 0.0)  // order outside quarter
    ).toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val out = RelationalAnalytics.returnedItemReport(
      cust, ord, li, nat, "1996-10-01", "1997-01-01", k = 10).collect()
    assert(out.map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("n_name"),
      r.getAs[Double]("revenue"))).toSeq ===
      Seq((2L, "FR", 100.0), (1L, "DE", 90.0))) // ordered by revenue desc

    val plan = RelationalAnalytics.returnedItemReport(
      t("customer"), t("orders"), t("lineitem"), t("nation"),
      "1996-10-01", "1997-01-01", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rfmSegmentation: fences from percentiles, scores 1..4, recency inverted, no global window") {
    import spark.implicits._
    val ord = Seq(
      // cust 1: recent + frequent + big spender -> high scores
      (1L, 1L, "2001-08-01", 900.0), (2L, 1L, "2001-07-01", 900.0),
      (3L, 1L, "2001-06-01", 900.0), (4L, 1L, "2001-05-01", 900.0),
      // cust 2: middling
      (5L, 2L, "2000-06-01", 300.0), (6L, 2L, "2000-05-01", 300.0),
      // cust 3: one old small order
      (7L, 3L, "1996-01-01", 50.0)
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val out = RelationalAnalytics.rfmSegmentation(ord, "2001-09-01")
      .orderBy("o_custkey").collect()
    val c1 = out(0); val c3 = out(2)
    assert(c1.getAs[Int]("r_score") === 4) // most recent -> best
    assert(c1.getAs[Int]("f_score") === 4)
    assert(c1.getAs[Int]("m_score") === 4)
    assert(c1.getAs[String]("segment") === "444")
    assert(c3.getAs[Int]("r_score") === 1)
    assert(c3.getAs[Int]("f_score") === 1)
    assert(c3.getAs[Int]("m_score") === 1)
    assert(c1.getAs[Long]("r_days") === 31L)
    assert(c1.getAs[Double]("m_value") === 3600.0)
    // the plan must not contain an unpartitioned (global) window
    val plan = RelationalAnalytics.rfmSegmentation(ord, "2001-09-01")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("cohortRetention: hand-built cohorts, k offsets and fractions") {
    import spark.implicits._
    // cust 1: Jan + Mar (cohort Jan, k=0 and k=2)
    // cust 2: Jan only   (cohort Jan, k=0)
    // cust 3: Feb + Mar  (cohort Feb, k=0 and k=1)
    val ord = Seq(
      (1L, 1L, "1996-01-10"), (2L, 1L, "1996-01-20"), (3L, 1L, "1996-03-05"),
      (4L, 2L, "1996-01-15"),
      (5L, 3L, "1996-02-01"), (6L, 3L, "1996-03-30")
    ).toDF("o_orderkey", "o_custkey", "d")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"))
    val out = RelationalAnalytics.cohortRetention(ord).collect()
      .map(r => (r.getTimestamp(0).toString.take(7), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(out === Seq(
      ("1996-01", 0, 2L, 2L, 1.0),
      ("1996-01", 2, 1L, 2L, 0.5),
      ("1996-02", 0, 1L, 1L, 1.0),
      ("1996-02", 1, 1L, 1L, 1.0)))
  }

  test("basketPairs: hand-computed support and lift; duplicate lineitems collapse") {
    import spark.implicits._
    // baskets: {A,B,C}, {A,B}, {A,C}, {D}; A-B support 2, A-C support 2
    val li = Seq(
      (1L, 100L), (1L, 200L), (1L, 300L), (1L, 100L), // dup A in basket 1
      (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 300L),
      (4L, 400L)
    ).toDF("l_orderkey", "l_partkey")
    val out = RelationalAnalytics.basketPairs(li, minSupport = 2L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(6))))
      .toMap
    // n_orders = 4; A appears in 3, B in 2, C in 2
    // lift(A,B) = 2*4/(3*2) = 1.333333; lift(A,C) same
    assert(out.keySet === Set((100L, 200L), (100L, 300L)))
    assert(out((100L, 200L)) === ((2L, 1.333333)))
    assert(out((100L, 300L)) === ((2L, 1.333333)))
  }

  test("equiWidthHistogram: hand buckets, max lands in last bucket, constant column") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.5, 5.0, 10.0).toDF("v")
    val out = RelationalAnalytics.equiWidthHistogram(df, "v", 4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    // width 2.5: [0,2.5)x2, [2.5,5)x1, [5,7.5)x1, [7.5,10]x1 (max clamps)
    assert(out === Seq(
      (0, 0.0, 2.5, 2L), (1, 2.5, 5.0, 1L), (2, 5.0, 7.5, 1L),
      (3, 7.5, 10.0, 1L)))
    assert(out.map(_._4).sum === 5L)
    val const = RelationalAnalytics.equiWidthHistogram(
      Seq(3.0, 3.0, 3.0).toDF("v"), "v", 4).collect()
    assert(const.length === 1 && const.head.getInt(0) === 0 &&
      const.head.getLong(3) === 3L)
  }

  test("assocRules: asymmetric confidences; rank by exact lift") {
    import spark.implicits._
    // 10 orders: A in all 10, B in the 4 orders {1..4}, C in {1,2}
    val rows =
      (1L to 10L).map(o => (o, 100L)) ++
      (1L to 4L).map(o => (o, 200L)) ++
      (1L to 2L).map(o => (o, 300L))
    val li = rows.toDF("l_orderkey", "l_partkey")
    val r = RelationalAnalytics.assocRules(li, minSupport = 2, k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    // A(100)+B(200): n_ab=4, conf A->B = 4/10, conf B->A = 4/4 = 1
    val ab = r((100L, 200L))
    assert(ab.getAs[Long]("conf_ab_micro") === 400000L)
    assert(ab.getAs[Long]("conf_ba_micro") === 1000000L)
    // lift(A,B) = 4*10/(10*4) = 1 -> 1000000
    assert(ab.getAs[Long]("lift_micro") === 1000000L)
    // B+C: n_ab=2, lift = 2*10/(4*2) = 2.5 -> top rank
    val bc = r((200L, 300L))
    assert(bc.getAs[Long]("lift_micro") === 2500000L)
    assert(bc.getAs[Long]("rnk") === 1L)
  }

  test("q15: revenue ties all surface; q17 filter is exact cross-mult") {
    import spark.implicits._
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val ts = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    // suppliers 1 and 2 tie at 200.0, supplier 3 trails
    val li = Seq(
      (1L, 100.0, 0.0), (1L, 100.0, 0.0),
      (2L, 200.0, 0.0), (3L, 50.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", lit(ts))
    val top = RelationalAnalytics.topSupplier(supplier, li,
        "1996-01-01", "1996-04-01")
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(1L, 2L))

    // q17: part avg qty = (1+4+10)/3 = 5 → 0.2·avg = 1 → only qty<1
    // would pass... with qty 1 the exact form 5·3·1 < 15 is FALSE
    // (strict), so nothing passes; lower one qty to make one row pass
    val part = Seq((7L, "Brand#3", 5)).toDF("p_partkey", "p_brand", "p_size")
    val li17 = Seq((7L, 1.0, 700.0), (7L, 4.0, 1.0), (7L, 10.0, 1.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val none = RelationalAnalytics.smallQuantityRevenue(li17, part,
      "Brand#3", sizeCap = 15).collect().head
    assert(none.isNullAt(0)) // 5·3·1 = 15 is NOT < 15 — boundary exact
    val li17b = Seq((7L, 0.5, 700.0), (7L, 4.5, 1.0), (7L, 10.0, 1.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val one = RelationalAnalytics.smallQuantityRevenue(li17b, part,
      "Brand#3", sizeCap = 15).collect().head
    assert(one.getDouble(0) === 100.0) // 700/7
  }

  test("q19: disjunctive bands run as ONE scan of lineitem") {
    import spark.implicits._
    val part = Seq((1L, "Brand#1", 3), (2L, "Brand#2", 8),
      (3L, "Brand#3", 12), (4L, "Brand#1", 40))
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq((1L, 5.0, 100.0, 0.0), (2L, 15.0, 10.0, 0.0),
      (3L, 25.0, 1.0, 0.0), (4L, 5.0, 1000.0, 0.0), (1L, 40.0, 999.0, 0.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val df = RelationalAnalytics.discountedRevenue(li, part,
      Seq(("Brand#1", 5, 1L, 11L), ("Brand#2", 10, 10L, 20L),
        ("Brand#3", 15, 20L, 30L)))
    // rows 1,2,3 match; size-40 part and qty-40 line do not
    assert(df.collect().head.getDouble(0) === 111.0)
    val scans = df.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan ExistingRDD"))
    assert(scans <= 2, s"expected one scan per table:\n$scans")
  }

  test("giniByGroup: hand case, equality → 0, concentration → high") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L),          // G = 1/6
      ("b", 5L), ("b", 5L), ("b", 5L),          // perfectly equal → 0
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 100L)) // one owner
      .toDF("g", "v")
    val got = RelationalAnalytics.giniByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(got("a") === ((3L, 166666L)))
    assert(got("b") === ((3L, 0L)))
    // n=4, all mass at rank 4: G = (2·4·100 − 5·100)/(4·100) = 3/4
    assert(got("c") === ((4L, 750000L)))
  }

  test("giniByGroup: all-zero group yields 0, not a division error") {
    import spark.implicits._
    val df = Seq(("z", 0L), ("z", 0L)).toDF("g", "v")
    assert(RelationalAnalytics.giniByGroup(df, "g", "v")
      .collect().head.getLong(3) === 0L)
  }

  test("percentileRank: counting equals percent_rank, ties get min rank") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L))
      .toDF("id", "score")
    val got = RelationalAnalytics.percentileRank(df, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // n_less: 10→0, 20→1 (both ties), 30→3; denominator N-1 = 3
    assert(got === Map(1L -> 0L, 2L -> 333333L, 3L -> 333333L,
      4L -> 1000000L))
  }

  test("percentileRank: invariant to the block width") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, (i * 37) % 23)).toDF("id", "score")
    val a = RelationalAnalytics.percentileRank(df, "id", "score", 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = RelationalAnalytics.percentileRank(df, "id", "score", 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("percentileRank: single row → 0; too-wide domain refuses loudly") {
    import spark.implicits._
    val one = Seq((1L, 42L)).toDF("id", "score")
    assert(RelationalAnalytics.percentileRank(one, "id", "score")
      .collect().head.getLong(2) === 0L)
    val wide = (1L to 11L).map(i => (i, i * 1000L)).toDF("id", "score")
    val ex = intercept[IllegalArgumentException] {
      RelationalAnalytics.percentileRank(wide, "id", "score", 1L,
        maxBlocks = 10)
    }
    assert(ex.getMessage.contains("bounded"))
  }

  test("joinSizeProfile: exact pair counts, hot key flagged for salting") {
    import spark.implicits._
    // key 1: 100×100 pairs (hot); keys 2..6: 4×4 each; key 9 only on
    // the left (no output row — inner semantics)
    val left = ((1 to 100).map(_ => 1L) ++
      (2 to 6).flatMap(k => Seq.fill(4)(k.toLong)) ++ Seq(9L)).toDF("k")
    val right = ((1 to 100).map(_ => 1L) ++
      (2 to 6).flatMap(k => Seq.fill(4)(k.toLong))).toDF("k")
    val rows = RelationalAnalytics.joinSizeProfile(left, "k", right, "k",
      k = 10).collect()
    assert(rows.map(_.getLong(0)).toSet === (1L to 6L).toSet)
    val byKey = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
        r.getString(5)))).toMap
    assert(byKey(1L) === ((100L, 100L, "10000",
      10000L * 1000000L / 10080L, "salt")))
    assert(byKey(2L)._3 === "16")
    assert(byKey(2L)._5 === "plain")
    // ordered by share desc: the hot key leads
    assert(rows.head.getLong(0) === 1L)
  }

  test("minCostSupplier (Q2): every row sits at its part's regional minimum") {
    val df = RelationalAnalytics.minCostSupplier(
      t("region"), t("nation"), t("supplier"), t("part"), t("lineitem"),
      "EUROPE", "STANDARD", 20, 100)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent recompute: min extendedprice per (part, region supplier)
    val regionSupp = t("supplier")
      .join(t("nation").join(t("region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val stdParts = t("part")
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 20)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val minByPart = t("lineitem")
      .filter(col("l_partkey").isin(stdParts.toSeq: _*) &&
        col("l_suppkey").isin(regionSupp.toSeq: _*))
      .groupBy("l_partkey").agg(min("l_extendedprice").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(math.abs(r.getAs[Double]("supply_cost") - minByPart(pk)) < 1e-6)
    }
    // dims broadcast, no cartesian anywhere in the plan
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("orderPriorityCheck (Q4): matches the manual EXISTS computation") {
    val got = RelationalAnalytics.orderPriorityCheck(
      t("orders"), t("lineitem"), "1996-01-01", "1996-04-01", 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lateOrders = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey").distinct()
    val expect = t("orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(lateOrders.withColumnRenamed("o_orderkey", "__k"),
        col("o_orderkey") === col("__k"), "left_semi")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.values.sum > 0)
  }

  test("productTypeProfit (Q9): partition-invariant exact sums") {
    val a = RelationalAnalytics.productTypeProfit(
      t("nation"), t("supplier"), t("part"), t("orders"), t("lineitem"),
      "red").collect()
    assert(a.nonEmpty)
    val b = RelationalAnalytics.productTypeProfit(
      t("nation"), t("supplier"), t("part"), t("orders"),
      t("lineitem").repartition(17), "red").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // profit can be negative (cost proxy exceeds discounted revenue)
    // but must be finite everywhere
    a.foreach(r => assert(!r.getAs[Double]("sum_profit").isNaN))
  }

  test("importantParts (Q11): threshold exact, ordering total") {
    // sf0.001 is tiny — pick a nation that actually has suppliers
    val nationName = t("supplier")
      .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
      .select("n_name").limit(1).collect().head.getString(0)
    val df = RelationalAnalytics.importantParts(
      t("nation"), t("supplier"), t("lineitem"), nationName, 800)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every kept part's decimal value × 800 must exceed the total
    val supp = t("supplier")
      .join(t("nation").filter(col("n_name") === nationName),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val byPart = t("lineitem")
      .filter(col("l_suppkey").isin(supp.toSeq: _*))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val total = byPart.values.reduce(_ add _)
    val kept = rows.map(_.getAs[Long]("ps_partkey")).toSet
    val expectKept = byPart.filter { case (_, v) =>
      v.multiply(new java.math.BigDecimal(800)).compareTo(total) > 0
    }.keySet
    assert(kept === expectKept)
    // descending by value, ties by part key
    val vals = rows.map(r => (r.getAs[Double]("value"), r.getAs[Long]("ps_partkey")))
    assert(vals.sortBy { case (v, k) => (-v, k) }.toSeq === vals.toSeq)
  }

  test("shipmodePriority (Q12): counts partition by priority exactly") {
    val rows = RelationalAnalytics.shipmodePriority(
      t("orders"), t("lineitem"), "1996-01-01", "1997-01-01", 60).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("MAIL", "SHIP", "RAIL")))
    val totalLate = t("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === totalLate)
  }

  test("partSupplierCounts (Q16): distinct-supplier count matches one group") {
    val rows = RelationalAnalytics.partSupplierCounts(
      t("part"), t("supplier"), t("lineitem"),
      "Brand#5", "PROMO", Seq(1, 5, 10, 15, 20, 25, 30, 35)).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val (brand, ptype, size) = (r0.getString(0), r0.getString(1), r0.getLong(2))
    val okSupp = t("supplier").filter(col("s_acctbal") >= 0.0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val parts = t("part")
      .filter(col("p_brand") === brand && col("p_type") === ptype &&
        col("p_size") === size)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val expect = t("lineitem")
      .filter(col("l_partkey").isin(parts.toSeq: _*))
      .select("l_partkey", "l_suppkey").distinct()
      .collect().map(_.getLong(1)).filter(okSupp).toSet.size
    assert(r0.getLong(3) === expect.toLong)
  }

  test("promotablePartSuppliers (Q20): membership matches the half test") {
    val got = RelationalAnalytics.promotablePartSuppliers(
      t("nation"), t("supplier"), t("part"), t("lineitem"),
      "blue", Seq("NATION_9", "NATION_6", "NATION_11"),
      "1996-01-01", "1997-01-01")
      .collect().map(_.getString(0)).toSet
    val parts = t("part").filter(col("p_name").startsWith("blue"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = t("lineitem")
      .filter(col("l_partkey").isin(parts.toSeq: _*))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        (col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .as("in_win"))
      .collect()
    val hotSupp = li.groupBy(r => (r.getLong(0), r.getLong(1)))
      .collect { case ((_, sk), rs)
        if 2 * rs.filter(_.getBoolean(3))
          .map(_.getDouble(2)).sum > rs.map(_.getDouble(2)).sum => sk }
      .toSet
    val nationSupp = t("supplier")
      .join(t("nation")
          .filter(col("n_name").isin("NATION_9", "NATION_6", "NATION_11")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = hotSupp.flatMap(nationSupp.get)
    assert(got === expect)
  }

  test("waitingSuppliers (Q21): equals the EXISTS/NOT-EXISTS formulation") {
    val got = RelationalAnalytics.waitingSuppliers(
      t("nation"), t("supplier"), t("orders"), t("lineitem"),
      Seq("NATION_9", "NATION_6"), 60, 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute force on the driver: per finished order, supplier sets
    val li = t("lineitem")
      .join(t("orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
      .collect()
    val byOrder = li.groupBy(_.getLong(0))
    val nationSupp = t("supplier")
      .join(t("nation").filter(col("n_name").isin("NATION_9", "NATION_6")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = scala.collection.mutable.Map[String, Long]()
    byOrder.values.foreach { rs =>
      val supps = rs.map(_.getLong(1)).toSet
      val lateSupps = rs.filter(_.getBoolean(2)).map(_.getLong(1)).toSet
      if (supps.size > 1 && lateSupps.size == 1)
        nationSupp.get(lateSupps.head).foreach { n =>
          counts(n) = counts.getOrElse(n, 0L) + 1L
        }
    }
    assert(got === counts.toMap)
  }

  test("joinSizeProfile plan: fact tables never join each other") {
    import spark.implicits._
    val left = (1L to 5000L).map(i => i % 40).toDF("k")
    val right = (1L to 5000L).map(i => i % 25).toDF("k")
    val df = RelationalAnalytics.joinSizeProfile(left, "k", right, "k", 5)
    val plan = df.queryExecution.executedPlan.toString
    // the join operands are the aggregated key-count relations: every
    // join input must sit above a HashAggregate, and nothing cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(df.collect().length === 5)
  }
}
