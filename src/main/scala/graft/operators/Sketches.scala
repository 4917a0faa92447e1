package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count–Min Sketch over corpus term frequencies — the third sketch
 * family beside the HLL distinct-gram estimator
 * ([[TextAnalysis.ngramDiversityApprox]]) and the bloom-filter join
 * prune ([[BloomJoin]]). At 100 TB the exact term-frequency relation
 * is itself huge (open web vocab ≈ billions of keys with a long tail);
 * a CMS answers point-frequency queries from d·w counters with a
 * one-sided error: estimate ≥ truth always, estimate ≤ truth + εN with
 * probability 1−δ (ε = e/w, δ = e^−d — Cormode & Muthukrishnan 2005).
 *
 * Everything is deterministic relational algebra, no sketch library:
 * the d hash rows are md5-derived buckets (seeded "cms:j:"), the
 * sketch is a (j, bucket, cnt) relation of ≤ d·w rows, and a point
 * query is min over j of the matching cells. Build shape: ONE
 * pre-aggregate to exact per-term counts (map-side partials over the
 * token stream), then the d-way explode runs over |vocab| rows, not
 * |tokens| — the standard two-level fold. The estimate never needs
 * the exact counts at query time; the driver row carries both only so
 * the oracle can check the estimate against its own reconstruction.
 */
object CountMinSketch {

  /** md5-seeded bucket for hash row `j`: value of the digest's first
    * two hex nibbles (0..255) modulo `width`. */
  def bucket(term: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms:$j:"), term)), 1, 2), 16, 10)
      .cast("int") % width

  /** Exact per-term counts of the space-token stream — the CMS input
    * relation (and the oracle's ground truth). */
  def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Build the (j, bucket, cnt) sketch relation, depth × width cells
    * max. */
  def build(docs: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2, s"cms $depth x $width")
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(col("term"), j, width).as("bucket")))
    termCounts(docs, textCol)
      .select(explode(array(cells: _*)).as("cell"), col("cnt"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(sum("cnt").as("cnt"))
  }

  /** Point-frequency estimates for `queryTerms` (a small relation with
    * a `term` column): min over hash rows of the matched cell. A term
    * whose cell is absent (never incremented) estimates 0. */
  def estimate(
      sketch: DataFrame, queryTerms: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(col("term"), j, width).as("bucket")))
    queryTerms
      .select(col("term"), explode(array(cells: _*)).as("cell"))
      .join(broadcast(sketch),
        col("cell.j") === sketch("j") && col("cell.bucket") === sketch("bucket"),
        "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}

/**
 * Bottom-k (k-minimum-values) set sketches for pairwise source
 * similarity — "which of my 10 000 crawl sources duplicate each
 * other?" answered from k-row sketches instead of an all-pairs join
 * over corpus-sized sets (Broder's min-wise estimator in its
 * one-permutation bottom-k form, the same family as [[Dedup]]'s
 * MinHash but sketching whole SOURCES, not documents).
 *
 * Per source: the k lexicographically-smallest md5(text) digests of
 * its distinct documents. For a source pair, with M = the k smallest
 * of the sketch union, Ĵ = |M ∩ S_a ∩ S_b| / |M| is an unbiased
 * Jaccard estimate. Everything is deterministic (md5 order, integer
 * counts, one final division), so the DuckDB oracle rebuilds the
 * sketches and estimates bit-for-bit.
 *
 * 100 TB shape: building sketches is one shuffle of distinct
 * (source, digest) pairs (the per-source window is the simple
 * formulation; a bounded bottom-k TypedImperativeAggregate à la
 * `topk_by_score` is the drop-in when one source's distinct set
 * dwarfs a partition). Everything pairwise then runs on P·k-row
 * relations — broadcast-sized even at millions of documents per
 * source. The EXACT Jaccard columns exist for verification; at scale
 * one runs the estimator alone — that is the point of the sketch.
 */
object BottomKSketch {

  /** (src, h): the k smallest distinct md5 digests per source. */
  def sourceSketches(
      docs: DataFrame, srcCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col(srcCol).as("src"), md5(col(textCol)).as("h")).distinct()
      .withColumn("__rk",
        row_number().over(Window.partitionBy("src").orderBy("h")))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Pairwise source similarity: per (src_a < src_b) the bottom-k
    * estimate next to the exact Jaccard of the distinct-digest sets. */
  def pairwiseJaccard(
      docs: DataFrame, srcCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = docs.select(col(srcCol).as("src"), md5(col(textCol)).as("h")).distinct()
    val sk = sourceSketches(docs, srcCol, textCol, k)
    // all source pairs: a deliberate P×P cross of the tiny distinct-
    // source relation (P sources, not P docs)
    val srcs = all.select("src").distinct()
    val pairs = srcs.select(col("src").as("src_a"))
      .crossJoin(srcs.select(col("src").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    // M: bottom-k of the sketch UNION per pair
    val u = pairs.join(sk.withColumnRenamed("src", "src_a"), Seq("src_a"))
      .select("src_a", "src_b", "h")
      .unionByName(
        pairs.join(sk.withColumnRenamed("src", "src_b"), Seq("src_b"))
          .select("src_a", "src_b", "h"))
      .distinct()
    val m = u.withColumn("__rk", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("h")))
      .filter(col("__rk") <= k)
    val mSize = m.groupBy("src_a", "src_b").agg(count(lit(1)).as("m_size"))
    val estNum = m
      .join(sk.select(col("src").as("src_a"), col("h")), Seq("src_a", "h"))
      .join(sk.select(col("src").as("src_b"), col("h")), Seq("src_b", "h"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("est_num"))
    // exact side (verification / small-P ground truth)
    val sizes = all.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = all.select(col("src").as("src_a"), col("h"))
      .join(all.select(col("src").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(mSize, Seq("src_a", "src_b"), "left")
      .join(estNum, Seq("src_a", "src_b"), "left")
      .join(sizes.withColumnRenamed("src", "src_a").withColumnRenamed("n", "na"),
        Seq("src_a"))
      .join(sizes.withColumnRenamed("src", "src_b").withColumnRenamed("n", "nb"),
        Seq("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(
        col("src_a"), col("src_b"),
        coalesce(col("est_num"), lit(0L)).as("est_num"),
        coalesce(col("m_size"), lit(0L)).as("m_size"),
        (coalesce(col("est_num"), lit(0L)).cast("double") /
          col("m_size").cast("double")).as("est_jaccard"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).as("uni"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).cast("double"))
          .as("exact_jaccard"))
  }
}

/**
 * HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
 * mergeable cardinality estimator every corpus datacard needs at
 * 100 TB, where `count(distinct user_id)` is itself a full shuffle of
 * the distinct keys but an HLL is m bytes, merged associatively by
 * per-register max. Beside the CMS (point frequency) and bottom-k
 * (set similarity) families this completes the classic sketch trio.
 *
 * Deterministic relational construction, no sketch library and no
 * RNG: the 56-bit hash is the first 14 hex nibbles of md5(key); the
 * first 2 nibbles select one of m = 256 registers, the remaining 12
 * nibbles (48 bits) yield rho = 1 + count of leading zero bits
 * (49 when all 48 are zero). Registers are a (bucket, max rho)
 * relation — ONE hash aggregate with map-side partials; the merge of
 * two sketches is the same aggregate over their union.
 *
 * The estimate E = alpha_m * m^2 / sum_j 2^(-M_j) is reproduced
 * BIT-EXACTLY by the SQL oracle: each 2^(-rho) is an exact IEEE
 * double (a power of two, exponents 0..-49 spanning < 53 bits), so
 * the sum is exact regardless of partition order, and alpha_m is the
 * same literal expression `0.7213 / (1 + 1.079 / m)` evaluated by
 * both engines' correctly-rounded double division. The small-range
 * (linear counting) and large-range corrections need `ln`, whose
 * last-ulp behavior is libm-specific — they are deliberately NOT
 * applied here; instead the correction INPUTS (`v_zero`, `m`) ride
 * along so a consumer applies its own. Empty input estimates 0 (the
 * uncorrected formula would put all mass on empty registers).
 */
object HyperLogLog {

  val NumRegisters = 256 // p = 8 bucket bits

  /** alpha_256, the identical literal expression the oracle uses. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)

  /** Small-range (linear-counting) correction, PRECOMPUTED: entry
    * v-1 holds round(m * ln(m / v)) for v_zero = v in 1..m. The `ln`
    * is evaluated ONCE here in the JVM and the resulting integers are
    * shipped as literals to both the engine plan and the SQL oracle —
    * so the correction is cross-engine bit-exact (no query-time
    * transcendentals, whose last-ulp behavior is libm-specific; same
    * discipline as the DP inverse-CDF and Benford tables). */
  val LinearCountingTable: Array[Long] =
    (1 to NumRegisters).map(v =>
      math.round(NumRegisters.toDouble *
        math.log(NumRegisters.toDouble / v))).toArray

  /** The standard HLL small-range switch threshold, 2.5 * m. */
  val SmallRangeThreshold: Double = 2.5 * NumRegisters

  /** The corrected BIGINT estimate from the raw harmonic estimate and
    * its correction inputs — the exact branch structure the HLL
    * count-DISTINCT rewrite plan and its SQL oracle both embed. */
  def corrected(vZero: Long, estRaw: Double): Long =
    if (vZero >= NumRegisters) 0L // no register hit: empty input
    else if (vZero > 0 && estRaw < SmallRangeThreshold)
      LinearCountingTable((vZero - 1).toInt)
    else math.round(estRaw)

  /** The (bucket, rho) register relation: one aggregate, mergeable.
    * Leading zeros are counted per NIBBLE (zero nibbles via a `^0*`
    * regexp over the 12-char hex window, then a 4-way CASE inside the
    * first non-zero nibble) so the identical arithmetic runs in any
    * SQL engine without 64-bit integer-conversion support. */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val h = md5(col(keyCol).cast("string"))
    val w = substring(h, 3, 12)
    val zn = length(regexp_extract(w, "^0*", 0))
    val fnz = conv(substr(concat(w, lit("f")), zn + lit(1), lit(1)), 16, 10)
      .cast("int")
    val rho = when(zn === 12, lit(49))
      .otherwise(zn * 4 + when(fnz >= 8, 0).when(fnz >= 4, 1)
        .when(fnz >= 2, 2).otherwise(3) + 1)
    df.select(conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket"),
        rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** Per-group register relations: (groupCols..., bucket, rho) — the
    * sharded/datacard form. Merging an old sketch with a delta
    * batch's sketch is the SAME aggregate over their union
    * ([[mergeRegisters]]), which is the whole point: a daily corpus
    * refresh updates per-source cardinality cards without rescanning
    * history (the register relation is ≤ |groups|·m rows — metadata,
    * not data). */
  def registersPer(
      df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val h = md5(col(keyCol).cast("string"))
    val w = substring(h, 3, 12)
    val zn = length(regexp_extract(w, "^0*", 0))
    val fnz = conv(substr(concat(w, lit("f")), zn + lit(1), lit(1)), 16, 10)
      .cast("int")
    val rho = when(zn === 12, lit(49))
      .otherwise(zn * 4 + when(fnz >= 8, 0).when(fnz >= 4, 1)
        .when(fnz >= 2, 2).otherwise(3) + 1)
    df.select(groupCols.map(col) :+
        conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket") :+
        rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("rho"))
  }

  /** Union-merge of register relations (associative, idempotent). */
  def mergeRegisters(groupCols: Seq[String], sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("rho"))

  /** Per-group raw estimate from a register relation. */
  def estimatePer(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = NumRegisters
    regs.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("sum_inv"),
        count(lit(1)).as("n_hit"))
      .select(groupCols.map(col) :+
        (lit(m.toLong) - col("n_hit")).as("v_zero") :+
        (lit(Alpha) * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_inv") +
            (lit(m.toLong) - col("n_hit")).cast("double")))
          .as("est_distinct"): _*)
  }

  /** One-row summary: raw estimate, correction inputs, exact truth
    * (the verification column a 100 TB run omits). */
  def estimateWithTruth(df: DataFrame, keyCol: String): DataFrame = {
    val regs = registers(df, keyCol)
    val m = NumRegisters
    val summary = regs.agg(
      sum(pow(lit(2.0), -col("rho"))).as("sum_inv"),
      count(lit(1)).as("n_hit"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    summary.crossJoin(exact)
      .select(
        lit(m).as("m"),
        (lit(m.toLong) - col("n_hit")).as("v_zero"),
        // empty registers contribute 2^0 = 1 each to the harmonic sum;
        // a fully-empty sketch short-circuits to 0 (the raw formula
        // would report alpha*m from the all-empty register mass)
        when(col("n_hit") === 0, lit(0.0))
          .otherwise(lit(Alpha) * lit(m.toDouble) * lit(m.toDouble) /
            (coalesce(col("sum_inv"), lit(0.0)) +
              (lit(m.toLong) - col("n_hit")).cast("double")))
          .as("est_distinct"),
        col("exact_distinct"))
  }
}
