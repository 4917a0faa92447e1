package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Relational analytics over the TPC-H-shaped star schema — the
 * warehouse-side workload of a training-data pipeline (cost/provenance
 * rollups, join pyramids over fact + dimension tables). Beyond-reference
 * scope (the reference is single-table, SURVEY.md §2.2); each method
 * demonstrates one scale pattern the engine relies on at 100 TB:
 *
 *  - '''Partial aggregation''': every groupBy here is a hash aggregate
 *    with map-side partials — the shuffle carries one row per
 *    (partition, group), never per input row.
 *  - '''Broadcast dimension joins''': dimension tables (region, nation,
 *    customer, supplier, part) are broadcast explicitly; the fact table
 *    (lineitem, orders) never shuffles for a dimension join. Only
 *    fact ⋈ fact joins (lineitem ⋈ orders) shuffle, on the join key.
 *  - '''Semi/anti joins''': existence checks ship only the key column
 *    and deduplicate map-side; never a join-then-distinct.
 *  - '''Exact decimal accumulation''': money sums are computed per-row
 *    in double (bit-identical in any engine), cast to DECIMAL(18,6)
 *    (deterministic per value), and summed exactly — so results cannot
 *    depend on partition count or visit order, the precondition for the
 *    driver's hash-match oracle and for reproducible pipelines at any
 *    parallelism.
 */
object RelationalAnalytics {

  /** Per-row money expression, accumulated exactly: double → decimal
    * cast per row, exact decimal sum, one final double. */
  private def decSum(e: Column): Column = sum(e.cast("decimal(18,6)")).cast("double")

  /** revenue = extendedprice * (1 - discount), per row in double. */
  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /**
   * TPC-H Q1 shape: pricing summary by return flag / line status over
   * lineitem shipped on or before `cutoff`.
   *
   * Scale: filter + the 7 referenced columns push into the Parquet scan
   * (predicate pushdown + column pruning); one shuffle of ≤ |groups| ×
   * partitions partial rows. Averages derive from the exact sums (one
   * final division) — not from `avg()`, whose double accumulation is
   * partition-order dependent.
   */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    // widen: the decimal partial sums are the whole query; on a
    // one-row-group local file they'd run in a single map task
    // (decimal arithmetic is the slowest per-row math in the suite).
    // Exact decimal addition is order-insensitive, so the fan-out is
    // safe; at scale the scan parallelizes and widen is a no-op.
    Fanout.widen(lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(revenue).as("sum_disc_price"),
        decSum(revenue * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 4))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 4))
      .orderBy("l_returnflag", "l_linestatus")

  /**
   * TPC-H Q6 shape: forecast-revenue-change — ONE filtered scan, ONE
   * scalar aggregate, zero joins. The whole query is a predicate
   * (`shipdate` range ∧ `discount` band ∧ `quantity` cap) over three
   * columns plus a two-column product sum, so the RIGHT plan is a
   * Parquet scan with all three predicates in `PushedFilters`, the
   * five referenced columns in `ReadSchema`, map-side partial sums,
   * and a 1-row exchange. At 100 TB this is the canonical
   * "scan-bound" query: row-group min/max statistics on `l_shipdate`
   * skip ~6/7 of the files before a byte is read.
   *
   * Reference scope note: the reference's SQL surface is YDB `SELECT`
   * over its vector table (`/root/reference/app.py:159-175`); the
   * TPC-H rows exercise this engine's general relational surface at
   * the shapes the benchmark standardizes.
   */
  def forecastRevenue(
      lineitem: DataFrame, yearStart: String, yearEnd: String,
      discLo: Double, discHi: Double, qtyCap: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(yearStart).cast("timestamp") &&
        col("l_shipdate") < lit(yearEnd).cast("timestamp") &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyCap)
      .agg(
        decSum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /**
   * Equi-width histogram of a numeric column — the value-distribution
   * card (order totals, doc lengths, scores) as two passes: one
   * min/max aggregate (a 1-row broadcast), then one bucketing
   * aggregate with `least(floor((v - min)/w), nb-1)` so the max
   * value lands in the last bucket instead of one past it. Bucket
   * EDGES are emitted as data (lo/hi per row), so the card is
   * self-describing; all counts integer-exact, the only doubles are
   * the shared IEEE width division both engines compute identically.
   */
  def equiWidthHistogram(
      df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 10000, s"nBuckets: $nBuckets")
    val v = col(valueCol).cast("double")
    val mm = df.filter(v.isNotNull)
      .agg(min(v).as("v_min"), max(v).as("v_max"), count(lit(1)).as("n_total"))
    val w = (col("v_max") - col("v_min")) / nBuckets
    df.filter(v.isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("v_max") === col("v_min"), 0)
          .otherwise(least(floor((v - col("v_min")) / w), lit(nBuckets - 1)))
          .cast("int").as("bucket"),
        col("v_min"), col("v_max"), col("n_total"))
      .groupBy("bucket", "v_min", "v_max", "n_total")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        round(col("v_min") + col("bucket") *
          ((col("v_max") - col("v_min")) / nBuckets), 6).as("lo"),
        round(col("v_min") + (col("bucket") + 1) *
          ((col("v_max") - col("v_min")) / nBuckets), 6).as("hi"),
        col("n"), col("n_total"))
      .orderBy("bucket")
  }

  /**
   * Market-basket pair mining (frequent itemsets, k=2): which parts
   * co-occur in the same order more often than chance — support
   * counts and the lift ratio that separates real affinity from two
   * independently-popular items. The pair generator is the
   * ORDER-BOUNDED self-join: equality on the order key, `a < b` on
   * the item, so a basket of m items emits m·(m−1)/2 pairs —
   * scan-shaped when baskets are small (TPC-H ~4, retail ~20), and
   * the `minSupport` cut keeps the output to genuinely frequent
   * pairs. Lift = n_ab·N / (n_a·n_b) computed from exact integer
   * counts with one 6-dp-rounded division at the end.
   */
  def basketPairs(lineitem: DataFrame, minSupport: Long): DataFrame = {
    // NOT materialized despite 4 references (order count, item counts,
    // both self-join sides): the distinct's exchange is identical under
    // all four, so AQE exchange reuse already runs the scan+distinct
    // once — an eager localCheckpoint here was measured 14 % SLOWER at
    // sf0.1 (r17; r16 predicted the same).
    val items = lineitem.select(col("l_orderkey").as("okey"),
      col("l_partkey").as("part")).distinct()
    val n = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = items.groupBy("part")
      .agg(count(lit(1)).as("n_item"))
    val pairs = items.join(
        items.select(col("okey"), col("part").as("part_b")), "okey")
      .filter(col("part") < col("part_b"))
      .groupBy(col("part").as("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("part").as("part_a"), col("n_item").as("n_a")),
        "part_a")
      .join(itemCounts.select(col("part").as("part_b"), col("n_item").as("n_b")),
        "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_orders"),
        round(col("n_ab") * col("n_orders") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy("part_a", "part_b")
  }

  /**
   * Directional association rules over the basket-pair relation —
   * [[basketPairs]] plus the asymmetric signal lift alone hides:
   * confidence(a→b) = n_ab/n_a vs confidence(b→a) = n_ab/n_b ("diaper
   * buyers buy beer" is actionable in one direction only). Both
   * confidences ride the micro grid (one integral division each);
   * ranking is lift-micro desc (exact DECIMAL integral — the same
   * quantity basketPairs rounds for display) with the pair as
   * tie-break, so the ordering never touches a float. Same shape as
   * basketPairs: order-bounded self-join, vocab-sized aggregates,
   * TakeOrderedAndProject top-k.
   */
  def assocRules(
      lineitem: DataFrame, minSupport: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // same exchange-reuse reasoning as [[basketPairs]] — no checkpoint
    val items = lineitem.select(col("l_orderkey").as("okey"),
      col("l_partkey").as("part")).distinct()
    val n = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = items.groupBy("part")
      .agg(count(lit(1)).as("n_item"))
    val pairs = items.join(
        items.select(col("okey"), col("part").as("part_b")), "okey")
      .filter(col("part") < col("part_b"))
      .groupBy(col("part").as("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.operators.Retrieval.singlePartitionKey(col("part_a")))
      .orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
    pairs
      .join(itemCounts.select(col("part").as("part_a"), col("n_item").as("n_a")),
        "part_a")
      .join(itemCounts.select(col("part").as("part_b"), col("n_item").as("n_b")),
        "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        expr("(CAST(n_ab AS DECIMAL(38,0)) * 1000000) div n_a")
          .as("conf_ab_micro"),
        expr("(CAST(n_ab AS DECIMAL(38,0)) * 1000000) div n_b")
          .as("conf_ba_micro"),
        expr("(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /**
   * Cohort retention — the acquisition-month × months-since grid
   * every growth/engagement dashboard is built on: of the customers
   * whose FIRST order fell in month M, what fraction ordered again
   * k months later. Three aggregates, one keyed join: distinct
   * (customer, month) activity, per-customer min month (the cohort),
   * then (cohort, k) distinct-active counts against cohort sizes.
   * All counts integer-exact; the single retention division rounds
   * at 6 dp. Shapes at 100 TB: every aggregate has map-side
   * partials; the join key (custkey) is the natural bucket column.
   */
  def cohortRetention(orders: DataFrame): DataFrame = {
    val om = orders
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .distinct()
    val cohort = om.groupBy("o_custkey").agg(min(col("m")).as("cohort_month"))
    val act = om.join(cohort, "o_custkey")
      .select(col("cohort_month"),
        months_between(col("m"), col("cohort_month")).cast("int").as("k"),
        col("o_custkey"))
    val counts = act.groupBy("cohort_month", "k")
      .agg(countDistinct(col("o_custkey")).as("n_active"))
    val sizes = cohort.groupBy("cohort_month")
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, "cohort_month")
      .select(col("cohort_month"), col("k"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") / col("cohort_size").cast("double"), 6)
          .as("retention"))
      .orderBy("cohort_month", "k")
  }

  /**
   * RFM segmentation (recency / frequency / monetary) — the classic
   * customer-value card, and deliberately NOT the textbook
   * global-ntile formulation: `ntile(4)` over the whole relation is
   * an unpartitioned window (every row through ONE task — the exact
   * anti-pattern the bench log polices). Instead the three quartile
   * fences come from one exact-percentile aggregate (a 1-row
   * relation, broadcast back) and each score is a CASE against the
   * fences — two scans, no global sort, unchanged at 10⁹ customers.
   * Scores are 1..4 with 4 best (recency inverts: fewer days since
   * the last order is better). Fence ties resolve by the comparison
   * (`<=` lower fence wins), identically in the oracle's
   * `quantile_cont` — the same interpolated-percentile definition
   * Spark's `percentile` uses.
   */
  def rfmSegmentation(
      orders: DataFrame, refDate: String): DataFrame = {
    val per = orders.groupBy("o_custkey").agg(
      datediff(lit(refDate).cast("date"), max(col("o_orderdate")).cast("date"))
        .cast("long").as("r_days"),
      count(lit(1)).as("f_orders"),
      decSum(col("o_totalprice")).as("m_value"))
    val fences = per.agg(
      expr("percentile(r_days, array(0.25, 0.5, 0.75))").as("rq"),
      expr("percentile(f_orders, array(0.25, 0.5, 0.75))").as("fq"),
      expr("percentile(m_value, array(0.25, 0.5, 0.75))").as("mq"))
    def score(v: Column, q: Column, invert: Boolean): Column = {
      val s = when(v <= element_at(q, 1), 1)
        .when(v <= element_at(q, 2), 2)
        .when(v <= element_at(q, 3), 3)
        .otherwise(4)
      if (invert) lit(5) - s else s
    }
    per.crossJoin(broadcast(fences))
      .select(col("o_custkey"), col("r_days"), col("f_orders"),
        round(col("m_value"), 2).as("m_value"),
        score(col("r_days"), col("rq"), invert = true).as("r_score"),
        score(col("f_orders").cast("double"), col("fq"), invert = false)
          .as("f_score"),
        score(col("m_value"), col("mq"), invert = false).as("m_score"))
      .withColumn("segment", concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /**
   * TPC-H Q10 shape: returned-item reporting — which customers
   * returned the most revenue in a quarter. The classic
   * fact-to-fact-to-dimension chain: lineitem filtered to returns ⋈
   * orders filtered to the quarter (the ONE shuffled join, on
   * orderkey), then customer and nation broadcast (dimensions never
   * shuffle the fact), a grouped decimal-exact revenue sum, and
   * `TakeOrderedAndProject` for the top-k (k rows to the driver, not
   * the group set). `c_custkey` tie-breaks equal revenues so the cut
   * is total.
   */
  def returnedItemReport(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nation: DataFrame, quarterStart: String, quarterEnd: String,
      k: Int): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.filter(
          col("o_orderdate") >= lit(quarterStart).cast("timestamp") &&
          col("o_orderdate") < lit(quarterEnd).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(decSum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /**
   * TPC-H Q3 shape: top-k unshipped orders by revenue for one market
   * segment.
   *
   * Scale: customer (dimension) is broadcast — the orders scan never
   * shuffles for it; orders ⋈ lineitem is the one shuffled join, on
   * orderkey. Top-k is orderBy+limit → TakeOrderedAndProject (per-
   * partition partial top-k, k rows to the driver).
   */
  def topRevenueOrders(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, cutoff: String, k: Int): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val cust = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    orders.filter(col("o_orderdate") < cut)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(decSum(revenue).as("rev"))
      .orderBy(col("rev").desc, col("o_orderkey"))
      .limit(k)
  }

  /**
   * TPC-H Q5 shape: revenue by nation for one region and order-date
   * year, where the supplier and the customer share the nation.
   *
   * Scale: the dimension chain region → nation → (customer, supplier)
   * is resolved entirely with broadcast joins; lineitem ⋈ orders is the
   * only shuffled join. The c_nationkey = s_nationkey constraint rides
   * the same broadcast joins — no extra shuffle.
   */
  def regionalSupplierVolume(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String, yearStart: String, yearEnd: String): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = customer.join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey").as("cn_key"), col("n_name"))
    val supp = supplier.join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"))
    orders
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("cn_key"))
      .groupBy("n_name")
      .agg(decSum(revenue).as("rev"))
      .orderBy(col("rev").desc, col("n_name"))
  }

  /**
   * Anti join: customers with no orders in a date window. The probe side
   * ships only `o_custkey` (column pruning through the anti join) and
   * Spark deduplicates build-side keys — existence, not enumeration.
   */
  def customersWithoutOrders(
      customer: DataFrame, orders: DataFrame,
      from: String, until: String): DataFrame =
    customer.join(
      orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp")),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /**
   * TPC-H Q4 shape: order count by priority for orders containing at
   * least one bulk line item (semi join — each order counted once no
   * matter how many lines qualify).
   */
  def bulkOrderPriorities(
      orders: DataFrame, lineitem: DataFrame, minQty: Double): DataFrame =
    orders.join(
      lineitem.filter(col("l_quantity") >= minQty).select("l_orderkey"),
      col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /**
   * TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
   * join so zero-order customers land in the c_count=0 bucket, then a
   * histogram over the per-customer counts. Two aggregates, both on
   * keys the data is naturally keyed by; the first reduces |orders| →
   * |customers| before anything wide happens — the standard
   * "aggregate-then-histogram" shape that survives a fact table 10⁶×
   * the dimension.
   */
  def customerOrderDistribution(
      customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /**
   * Join-skew diagnostics card for a key column: total rows, distinct
   * keys, the exact top-k heaviest keys (bounded `topk_by_score`
   * aggregate — never a global sort), and the max/avg frequency ratio
   * — the number that predicts whether the next join on this key needs
   * salting or AQE skew handling. ONE pre-aggregate to |keys| rows;
   * everything after runs on the reduced relation.
   */
  def skewDiagnostics(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val freq = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    freq.agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_freq"),
        expr(s"topk_by_score(CAST(cnt AS DOUBLE), key, $k)").as("top"))
      .select(col("n_keys"), col("n_rows"), col("max_freq"),
        (col("max_freq").cast("double") *
          col("n_keys").cast("double") / col("n_rows").cast("double"))
          .as("skew_ratio"),
        // comma-joined string, not an array: flat schema survives any
        // downstream comparator/exporter
        expr("concat_ws(',', transform(top, t -> CAST(t.id AS STRING)))")
          .as("top_keys"))
  }

  /**
   * Top-k parts by revenue within each brand: broadcast dimension join
   * (part) + one shuffled aggregation on partkey + a per-brand window.
   * The window partitions by brand over the ALREADY-aggregated relation
   * (|parts| rows, not |lineitem| rows) — ranking after reduction is
   * the shape that survives a fact table 10⁶× the dimension.
   */
  def topPartsPerBrand(part: DataFrame, lineitem: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perPart = lineitem
      .join(broadcast(part.select("p_partkey", "p_brand", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey", "p_name")
      .agg(decSum(revenue).as("rev"))
    val w = Window.partitionBy("p_brand").orderBy(col("rev").desc, col("p_partkey"))
    perPart.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("p_brand", "rnk", "p_partkey", "p_name", "rev")
      .orderBy("p_brand", "rnk")
  }

  /**
   * CUBE over (market segment, order status): all four grouping
   * combinations in one pass — Spark expands the grouping sets before
   * the hash aggregate, so the fact table is still scanned once.
   * Expressed via the explicit `groupingSets` API: `Dataset.cube` after
   * a join trips Spark 4.1's ambiguous-self-join detector (the Expand
   * re-tags the grouping attributes), while the equivalent grouping-sets
   * plan does not.
   */
  def segmentStatusCube(customer: DataFrame, orders: DataFrame): DataFrame = {
    val seg = col("c_mktsegment")
    val status = col("o_orderstatus")
    orders
      .join(broadcast(customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupingSets(Seq(Seq(seg, status), Seq(seg), Seq(status), Seq()), seg, status)
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_price"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("o_orderstatus"))
  }

  /**
   * TPC-H Q18 shape: large-volume customers — orders whose total line
   * quantity exceeds `minTotalQty`, with customer and order detail.
   *
   * Scale: the reference SQL's `o_orderkey IN (SELECT ... HAVING)`
   * subquery IS the per-order aggregate, so it is computed ONCE and
   * reused as the probe side — lineitem is scanned a single time, not
   * twice (aggregate once, then join; never aggregate-in-subquery +
   * re-join-lineitem). The surviving order set is tiny (the HAVING
   * cut), so AQE broadcast-converts both detail joins; orders and
   * customer never shuffle. Quantities accumulate in exact decimal
   * (one final double), and the top-k is orderBy+limit →
   * TakeOrderedAndProject with a total tie-break.
   */
  def largeVolumeCustomers(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minTotalQty: Double, k: Int): DataFrame = {
    val bigOrders = lineitem
      .groupBy("l_orderkey")
      .agg(decSum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minTotalQty)
    bigOrders
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
  }

  /**
   * TPC-H Q7 shape (volume shipping): bilateral trade — revenue
   * between a SUPPLIER nation and a CUSTOMER nation, both directions,
   * by ship year. Both nation maps broadcast; the fact tables join on
   * their keys only.
   */
  def volumeShipping(
      nation: DataFrame, customer: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      nation1: String, nation2: String,
      from: String, until: String): DataFrame = {
    val n = nation.filter(col("n_name").isin(nation1, nation2))
      .select("n_nationkey", "n_name")
    val cust = customer.join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val supp = supplier.join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === nation1 && col("cust_nation") === nation2) ||
        (col("supp_nation") === nation2 && col("cust_nation") === nation1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(decSum(revenue).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /**
   * TPC-H Q8 shape (national market share): of the revenue a REGION's
   * customers spend on a part type, the share supplied by one target
   * nation, by order year. Exact DECIMAL sums; the share is one
   * double division rounded to 6 dp (both engines divide the same
   * exact sums).
   */
  def marketShare(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      part: DataFrame, regionName: String, partType: String,
      targetNation: String, from: String, until: String): DataFrame = {
    val regionNations = nation.join(
        broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = customer.join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppN = supplier.join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val parts = part.filter(col("p_type") === partType).select("p_partkey")
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        decSum(when(col("supp_nation") === targetNation, revenue)
          .otherwise(lit(0.0))).as("nation_rev"),
        decSum(revenue).as("total_rev"))
      .select(col("o_year"),
        round(col("nation_rev") / col("total_rev"), 6).as("mkt_share"),
        round(col("total_rev"), 6).as("total_rev"))
      .orderBy("o_year")
  }

  /**
   * TPC-H Q14 shape (promotion effect): the percentage of a month's
   * lineitem revenue from PROMO-type parts. Part map broadcast; one
   * aggregate; percentage as one rounded division of exact sums.
   */
  def promoRevenue(
      lineitem: DataFrame, part: DataFrame,
      from: String, until: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(broadcast(part.select(col("p_partkey"),
        (col("p_type") === "PROMO").as("is_promo"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        decSum(when(col("is_promo"), revenue).otherwise(lit(0.0)))
          .as("promo_rev"),
        decSum(revenue).as("total_rev"))
      .select(
        round(col("promo_rev") * 100.0 / col("total_rev"), 6)
          .as("promo_pct"),
        round(col("total_rev"), 6).as("total_rev"))

  /**
   * TPC-H Q15 shape (top supplier): the supplier(s) whose revenue
   * over a window equals the maximum — the "view + max" query, here
   * as one aggregate and a 1-row broadcast of the max (ties all
   * surface, as in the spec query).
   */
  def topSupplier(
      supplier: DataFrame, lineitem: DataFrame,
      from: String, until: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(decSum(revenue).as("total_revenue"))
    val mx = rev.agg(max("total_revenue").as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("__mx"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue"), 6).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /**
   * TPC-H Q17 shape (small-quantity-order revenue): average yearly
   * revenue lost if small orders (< 20% of a part's average quantity)
   * of one brand's small parts were not stocked. The quantity filter
   * is EXACT cross-multiplication (`5·n·qty < Σqty`) — no division
   * enters the comparison. (The spec's container predicate has no
   * column here; p_size ≤ sizeCap stands in, declared, not hidden.)
   */
  def smallQuantityRevenue(
      lineitem: DataFrame, part: DataFrame,
      brand: String, sizeCap: Int): DataFrame = {
    val parts = part
      .filter(col("p_brand") === brand && col("p_size") <= sizeCap)
      .select("p_partkey")
    val li = lineitem.join(broadcast(parts),
      col("l_partkey") === col("p_partkey"))
    val avgQ = li.groupBy(col("p_partkey").as("__pk"))
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("__sq"),
        count(lit(1)).as("__n"))
    li.join(broadcast(avgQ), col("p_partkey") === col("__pk"))
      .filter(col("l_quantity").cast("decimal(18,6)") * 5 * col("__n") <
        col("__sq"))
      .agg(decSum(col("l_extendedprice")).as("__s"))
      .select(round(col("__s") / 7.0, 6).as("avg_yearly"))
  }

  /**
   * TPC-H Q19 shape (discounted revenue, disjunctive predicates):
   * three brand × size × quantity bands OR-ed together — the query
   * whose point is that the OR of selective conjuncts must still
   * push into ONE scan (a union of three scans triples the IO).
   */
  def discountedRevenue(
      lineitem: DataFrame, part: DataFrame,
      bands: Seq[(String, Int, Long, Long)]): DataFrame = {
    require(bands.nonEmpty, "need at least one (brand, maxSize, qLo, qHi) band")
    val p = broadcast(part.select("p_partkey", "p_brand", "p_size"))
    val cond = bands.map { case (b, sz, qLo, qHi) =>
      col("p_brand") === b && col("p_size").between(1, sz) &&
        col("l_quantity").between(qLo, qHi)
    }.reduce(_ || _)
    lineitem.join(p, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(decSum(revenue).as("revenue"))
  }

  /**
   * TPC-H Q22 shape (global sales opportunity): customers with
   * above-average positive account balances who have NOT ordered in a
   * window, grouped — the spec groups by phone country code, which
   * this schema doesn't carry, so the customer's nation stands in
   * (declared adaptation, same plan shape: scalar-subquery average
   * broadcast + anti join + group count). DECIMAL-exact balance sums.
   */
  def globalSalesOpportunity(
      customer: DataFrame, orders: DataFrame, nation: DataFrame,
      from: String, until: String): DataFrame = {
    // `bal > avg` as exact cross-multiplication `bal·n > Σbal` — the
    // engines' decimal-average intermediates differ in their last
    // bits, the cross-product does not.
    val posStats = customer.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(18,6)")).as("__sum"),
        count(lit(1)).as("__n"))
    val eligible = customer.crossJoin(broadcast(posStats))
      .filter(col("c_acctbal").cast("decimal(18,6)") * col("__n") >
        col("__sum"))
    val noOrders = eligible.join(
      orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
        .select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_anti")
    noOrders
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        decSum(col("c_acctbal")).as("totacctbal"))
      .select(col("n_name"), col("numcust").cast("long").as("numcust"),
        round(col("totacctbal"), 6).as("totacctbal"))
      .orderBy("n_name")
  }

  /**
   * Per-group Gini coefficient of a non-negative integer measure —
   * the concentration card: is a source's volume spread across many
   * documents or dominated by a few huge ones? (A near-1 Gini on
   * bytes-per-doc means "this source is three giant crawls and
   * dust" — a mixture-weighting and dedup-priority signal.)
   *
   * EXACT integer arithmetic via the grouped-data rank formula: for
   * sorted values with per-value counts c_j and cumulative ranks R_j,
   * `2·Σᵢ i·xᵢ = Σ_j v_j·c_j·(2R_j − c_j + 1)`, so
   * `gini_micro = 10⁶ · (2Σi·x − (n+1)Σx) div (n·Σx)` — DECIMAL(38,0)
   * sums, one integral division, zero for an all-zero or single-row
   * group. The window is PARTITIONED by group and runs on the
   * (group, value) histogram — bounded-domain metadata, same
   * economics as [[percentileRank]].
   */
  def giniByGroup(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "DECIMAL(38,0)"
    val h = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__g").orderBy("__v")
    val cum = h.withColumn("__r", sum("__c").over(w))
    cum.groupBy("__g").agg(
        sum("__c").as("__n"),
        sum(expr(s"CAST(__v AS $dec) * __c")).as("__s0"),
        sum(expr(s"CAST(__v AS $dec) * __c * (2 * __r - __c + 1)"))
          .as("__s1x2"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n_rows"),
        expr(s"CAST(__s0 AS $dec) div 1").as("total"),
        when(col("__s0") > 0,
          expr(s"(1000000 * (__s1x2 - (__n + 1) * __s0)) div (__n * __s0)"))
          .otherwise(0L).as("gini_micro"))
  }

  /**
   * Corpus-relative percentile rank WITHOUT a global sort, for
   * BOUNDED-DOMAIN integer scores (quantized quality scores 0..10⁴,
   * token counts, byte sizes under a cap): the standard SQL
   * `percent_rank()` is an unpartitioned window — a single-reducer
   * global sort, the one plan shape this repo bans — but over a
   * bounded domain the same number is pure COUNTING:
   *
   *   pct_micro(s) = (10⁶ · |{rows < s}|) div (N − 1)
   *
   * Build the score histogram (one map-side-combined aggregate to
   * ≤ |domain| rows), cumulate it two-level — within `score div
   * bucketWidth` blocks by a PARTITIONED window, across blocks by a
   * driver prefix over ≤ |domain|/bucketWidth totals (a bounded
   * model-boundary collect, same contract as the classifier fits) —
   * and broadcast-join the ≤|domain|-row rank table back to the
   * corpus. No corpus-sized sort or shuffle anywhere; the corpus is
   * touched by exactly two scans (histogram + join-back).
   */
  def percentileRank(
      df: DataFrame, idCol: String, scoreCol: String,
      bucketWidth: Long = 100L, maxBlocks: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth: $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(scoreCol).cast("long").as("__s"))
      .groupBy("__s").agg(count(lit(1)).as("__c"))
      .withColumn("__hi", expr(s"__s div $bucketWidth"))
    // across-block prefix: bounded collect (≤ maxBlocks rows) at the
    // driver — refuse loudly if the domain is wider than declared.
    val blocks = hist.groupBy("__hi").agg(sum("__c").as("__bc"))
      .orderBy("__hi").collect()
    require(blocks.length <= maxBlocks,
      s"percentileRank: ${blocks.length} blocks exceed maxBlocks=" +
        s"$maxBlocks — the score domain is not bounded enough for " +
        "counting ranks; raise bucketWidth or pre-quantize")
    var acc = 0L
    val prefixRows = blocks.map { r =>
      val p = acc; acc += r.getLong(1); (r.getLong(0), p)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val prefix = prefixRows.toDF("__hi", "__p")
    val w = Window.partitionBy("__hi").orderBy("__s")
    val ranks = hist
      .withColumn("__cum", sum("__c").over(w))
      .join(broadcast(prefix), "__hi")
      .select(col("__s"),
        (col("__p") + col("__cum") - col("__c")).as("__less"))
    val n = acc
    df.join(broadcast(ranks),
        df(scoreCol).cast("long") === ranks("__s"))
      .select(col(idCol), col(scoreCol),
        (if (n > 1) expr(s"(1000000 * __less) div ${n - 1}")
         else lit(0L)).as("pct_micro"))
  }

  /**
   * Pre-flight join-size profile — the planning card BEFORE a big
   * fact ⋈ fact join: exact per-key output cardinality
   * (`cnt_left(k) · cnt_right(k)`), each key's share of the total,
   * and a salt/plain verdict against a declared share threshold.
   * [[skewDiagnostics]] looks at ONE relation's key histogram; this
   * profiles the JOIN — a key that is mildly hot on both sides is
   * quadratically hot in the output, which is what melts an executor.
   *
   * Scale shape: two key-count aggregates (map-side partials, one row
   * per distinct key), an inner join of the two key-domain-sized
   * count relations, and a top-k — the fact tables are each scanned
   * once and never joined. Products and the total accumulate in
   * DECIMAL(38,0) (two 10-digit per-key counts already overflow a
   * BIGINT product — the apportion lesson); the per-key output rides
   * out as a canonical decimal STRING so no decimal type reaches the
   * driver comparator.
   *
   * @return top-`k` keys by predicted pair count:
   *         (key, cnt_left, cnt_right, pair_rows, share_micro,
   *         verdict) — verdict = 'salt' when the key's share exceeds
   *         `saltShareMicro`, else 'plain'.
   */
  def joinSizeProfile(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      k: Int = 10, saltShareMicro: Long = 200000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("cnt_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("cnt_right"))
    val pairs = lc.join(rc, "key")
      .select(col("key"), col("cnt_left"), col("cnt_right"),
        expr("CAST(cnt_left AS DECIMAL(38,0)) * cnt_right").as("__p"))
    val tot = pairs.agg(sum("__p").as("__tot"))
    pairs.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt_left"), col("cnt_right"),
        col("__p").cast("string").as("pair_rows"),
        expr("CAST((1000000 * __p) div __tot AS BIGINT)")
          .as("share_micro"))
      .withColumn("verdict",
        when(col("share_micro") > saltShareMicro, "salt")
          .otherwise("plain"))
      .orderBy(col("share_micro").desc, col("key"))
      .limit(k)
  }

  /**
   * TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
   * the region supplier(s) whose supply cost equals the part's
   * regional minimum — the correlated-min-subquery query. This schema
   * carries no partsupp, so the part-supplier catalog is DERIVED from
   * the fact table (declared adaptation): supply cost of (part,
   * supplier) = min observed `l_extendedprice` — a plain double min of
   * parquet-resident values, no arithmetic, so the equality join back
   * against the per-part minimum is bit-exact in any engine. Plan
   * shape preserved: catalog aggregate → per-part min (broadcast) →
   * equality join-back → dimension decorate → total-order top-k.
   */
  def minCostSupplier(
      region: DataFrame, nation: DataFrame, supplier: DataFrame,
      part: DataFrame, lineitem: DataFrame,
      regionName: String, partType: String, sizeCap: Int,
      k: Int): DataFrame = {
    val regionNations = nation.join(
        broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = supplier.join(broadcast(regionNations),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val parts = part
      .filter(col("p_type") === partType && col("p_size") <= sizeCap)
      .select("p_partkey")
    val catalog = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("supply_cost"))
    val minCost = catalog.groupBy(col("l_partkey").as("__pk"))
      .agg(min("supply_cost").as("__mc"))
    catalog
      .join(broadcast(minCost),
        col("l_partkey") === col("__pk") &&
          col("supply_cost") === col("__mc"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"),
        round(col("supply_cost"), 6).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(k)
  }

  /**
   * TPC-H Q4 shape (order-priority checking): orders placed in a
   * window that had at least one LATE line, counted by priority — the
   * semi-join-with-cross-table-predicate query. This schema has no
   * commit/receipt dates, so "late" is `l_shipdate > o_orderdate +
   * lateDays` (declared adaptation, same shape: the EXISTS predicate
   * references BOTH sides, so it cannot collapse to a key semi join —
   * the date rides the join). Only the two key+date columns shuffle.
   */
  def orderPriorityCheck(
      orders: DataFrame, lineitem: DataFrame,
      from: String, until: String, lateDays: Int): DataFrame = {
    val o = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
    o.join(lineitem.select("l_orderkey", "l_shipdate"),
        o("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >
            o("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /**
   * TPC-H Q9 shape (product-type profit): profit on one name-family of
   * parts by supplier nation and order year. No partsupp → unit supply
   * cost is proxied as 10% of `p_retailprice` (declared adaptation;
   * the join pyramid — part ⋈ lineitem ⋈ orders ⋈ supplier ⋈ nation —
   * and the negative-capable profit measure are the point). Per-row
   * profit is computed in double with a FIXED operation order
   * (`rev − retail·qty·0.1`), cast to DECIMAL(18,6) once, summed
   * exactly.
   */
  def productTypeProfit(
      nation: DataFrame, supplier: DataFrame, part: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      nameContains: String): DataFrame = {
    val parts = part.filter(col("p_name").contains(nameContains))
      .select("p_partkey", "p_retailprice")
    val suppN = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val amount = revenue -
      col("p_retailprice") * col("l_quantity") * lit(0.1)
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(decSum(amount).as("sum_profit"))
      .select(col("nation"), col("o_year"),
        round(col("sum_profit"), 6).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /**
   * TPC-H Q11 shape (important stock): parts whose value from one
   * nation's suppliers exceeds a fixed fraction of the total — the
   * scalar-subquery-threshold query. Value is the exact DECIMAL sum of
   * `l_extendedprice` over the nation's lineitems (partsupp proxy,
   * declared); the threshold test multiplies BOTH sides into integers
   * (`value·den > total`) so no division touches the comparison. One
   * fact aggregate, a 1-row broadcast, a filtered projection.
   */
  def importantParts(
      nation: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      nationName: String, fracDen: Int): DataFrame = {
    val supp = supplier.join(
        broadcast(nation.filter(col("n_name") === nationName)
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("ps_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("__v"))
    val tot = vals.agg(sum("__v").as("__tot"))
    vals.crossJoin(broadcast(tot))
      .filter(col("__v") * fracDen > col("__tot"))
      .select(col("ps_partkey"),
        round(col("__v").cast("double"), 6).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /**
   * TPC-H Q12 shape (shipping modes and order priority): late lines
   * shipped in a window, split urgent/other per mode. The schema has
   * no `l_shipmode`, so the mode is a declared derived column
   * (`l_linenumber mod 3` → MAIL/SHIP/RAIL — deterministic, replayed
   * verbatim by the oracle); "late" is the same shipdate-lag proxy as
   * [[orderPriorityCheck]]. One fact ⋈ fact join on the order key,
   * one hash aggregate of two conditional counts.
   */
  def shipmodePriority(
      orders: DataFrame, lineitem: DataFrame,
      from: String, until: String, lateDays: Int): DataFrame = {
    val mode = when(col("l_linenumber") % 3 === 0, "MAIL")
      .when(col("l_linenumber") % 3 === 1, "SHIP")
      .otherwise("RAIL")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(mode.as("shipmode"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("shipmode")
  }

  /**
   * TPC-H Q16 shape (parts/supplier relationship): distinct supplier
   * counts per (brand, type, size) over qualifying parts, excluding
   * flagged suppliers. The part-supplier relation is the DISTINCT
   * (l_partkey, l_suppkey) projection of the fact table (partsupp
   * proxy) and "complaints" is `s_acctbal < 0` (both declared). The
   * distinct runs map-side on two int keys; the count-distinct is the
   * standard two-level aggregate.
   */
  def partSupplierCounts(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      excludeBrand: String, excludeType: String,
      sizes: Seq[Int]): DataFrame = {
    val ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    val okSupp = supplier.filter(col("s_acctbal") >= 0.0)
      .select("s_suppkey")
    val parts = part
      .filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= excludeType &&
        col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    ps.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(okSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /**
   * TPC-H Q20 shape (potential part promotion): suppliers of one part
   * name-family whose shipments CONCENTRATE in a window — more than
   * half their all-time quantity of the part shipped inside it. The
   * spec's `ps_availqty > ½·window-qty` needs partsupp; with the
   * catalog derived from lineitem the all-time quantity stands in for
   * availability (declared adaptation, same nested-aggregate + semi
   * join chain). The half test is exact cross-multiplication on
   * DECIMAL sums (`2·window > total`), then one distinct-supplier semi
   * join up to the nation dimension.
   */
  def promotablePartSuppliers(
      nation: DataFrame, supplier: DataFrame, part: DataFrame,
      lineitem: DataFrame, namePrefix: String,
      nationNames: Seq[String], from: String, until: String): DataFrame = {
    val parts = part.filter(col("p_name").startsWith(namePrefix))
      .select("p_partkey")
    val inWindow =
      col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp")
    val qty = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(
        sum(col("l_quantity").cast("decimal(18,6)")).as("total_qty"),
        sum(when(inWindow, col("l_quantity")).otherwise(lit(0.0))
          .cast("decimal(18,6)")).as("window_qty"))
      .filter(col("window_qty") * 2 > col("total_qty"))
    val suppN = supplier
      .join(broadcast(nation
          .filter(col("n_name").isin(nationNames: _*))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    qty.select("l_suppkey").distinct()
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .select("s_name")
      .orderBy("s_name")
  }

  /**
   * TPC-H Q21 shape (suppliers who kept orders waiting): per supplier
   * in the named nations, finished orders where THAT supplier was the
   * only late one among several — the exists/not-exists double
   * correlation. Late is the shipdate-lag proxy (declared). Rather
   * than two correlated passes over the fact table, the plan computes
   * ONE per-order aggregate (distinct suppliers, distinct late
   * suppliers) and joins the late rows against it with
   * `supp_cnt > 1 AND late_cnt = 1` — set-algebraically identical to
   * the spec's EXISTS(other) AND NOT EXISTS(other late), in one
   * shuffle instead of three.
   */
  def waitingSuppliers(
      nation: DataFrame, supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nationNames: Seq[String],
      lateDays: Int, k: Int): DataFrame = {
    val li = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
          .as("late"))
    val perOrder = li.groupBy(col("l_orderkey").as("__ok"))
      .agg(countDistinct(col("l_suppkey")).as("supp_cnt"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("late_cnt"))
    val lateRows = li.filter(col("late"))
      .select("l_orderkey", "l_suppkey").distinct()
    val suppN = supplier
      .join(broadcast(nation
          .filter(col("n_name").isin(nationNames: _*))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    lateRows
      .join(perOrder.filter(col("supp_cnt") > 1 && col("late_cnt") === 1),
        col("l_orderkey") === col("__ok"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }
}
