package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Entity resolution (record linkage) over string-keyed records —
 * beyond-reference scope, the standard curation step for supplier /
 * author / site-name tables feeding a training corpus: the same
 * real-world entity appears under slightly different spellings and
 * must be linked WITHOUT an O(n²) all-pairs string comparison.
 *
 * The classic scalable shape (Fellegi–Sunter blocking, the same
 * family as the MinHash band trick in [[Dedup]]):
 *
 *  1. **multi-pass blocking** — each record emits a handful of cheap
 *     keys (here: first-k chars, last-k chars). Records sharing ANY
 *     key become candidates. One narrow (key, id, name) relation,
 *     one equality shuffle — never an inequality join. A single-char
 *     edit at position p preserves the prefix key (p > k) or the
 *     suffix key (p ≤ len−k), so recall is 1 for names longer than
 *     2k — the pigeonhole argument Manku's SimHash blocks use.
 *  2. **in-block verify** — `levenshtein` (codegen built-in) only on
 *     candidate pairs; pairs sharing several keys are deduplicated by
 *     (a, b) BEFORE the edit-distance runs.
 *  3. **cluster** — matched pairs feed [[ConnectedComponents]]
 *     (pointer doubling); each record's entity id = min record id in
 *     its component.
 *
 * At 100 TB the block keys are short fixed strings, the pair relation
 * carries ids + the two names only, and `maxBucket` (same knob as
 * [[SimilarityJoin]]) guards against viral blocks ("inc", "llc"
 * prefixes): a block larger than the cap is dropped — candidate loss
 * is logged by the caller's recall probe, never an executor OOM.
 */
object EntityResolution {

  /** (key, id, name) blocking relation: prefix-k and suffix-k passes.
    * Names shorter than k emit the whole name for both passes (still
    * valid keys, still equality-joinable). */
  private def blockingKeys(
      df: DataFrame, idCol: String, nameCol: String, k: Int): DataFrame = {
    val pre = df.select(
      concat(lit("p:"), substring(col(nameCol), 1, k)).as("blk"),
      col(idCol).as("id"), col(nameCol).as("name"))
    val suf = df.select(
      concat(lit("s:"), substring(col(nameCol), -k, k)).as("blk"),
      col(idCol).as("id"), col(nameCol).as("name"))
    pre.unionByName(suf)
  }

  /** Blocked candidate pairs (a_id < b_id, each pair once) — the
    * pre-verification relation [[fuzzyPairs]] and [[fellegiSunter]]
    * share. */
  private def candidates(
      df: DataFrame, idCol: String, nameCol: String,
      blockKeyLen: Int, maxBucket: Option[Int]): DataFrame = {
    val keys = blockingKeys(df, idCol, nameCol, blockKeyLen)
    val capped = maxBucket match {
      case Some(cap) =>
        // viral-block guard: count per key pre-join, drop oversized
        val sizes = keys.groupBy("blk").agg(count(lit(1)).as("__n"))
        keys.join(broadcast(sizes.filter(col("__n") <= cap)), Seq("blk"))
          .drop("__n")
      case None => keys
    }
    val a = capped.select(col("blk"), col("id").as("a_id"), col("name").as("a_name"))
    val b = capped.select(col("blk"), col("id").as("b_id"), col("name").as("b_name"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_name", "b_name")
      .distinct() // pairs sharing several blocks verify once
  }

  /**
   * Candidate pairs within `maxDist` edits, via prefix/suffix blocking.
   * Output: (a_id, b_id, a_name, b_name, dist, sim) with a_id < b_id,
   * each pair once, sim = 1 − dist / max(len) as a plain double
   * expression (deterministic — one division, no accumulation).
   */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockKeyLen: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    candidates(df, idCol, nameCol, blockKeyLen, maxBucket)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .withColumn("sim",
        lit(1.0) - col("dist").cast("double") /
          greatest(length(col("a_name")), length(col("b_name"))).cast("double"))
  }

  /**
   * Jaro–Winkler verification pass over the blocked candidates: the
   * string-similarity alternative to [[fuzzyPairs]]'s edit distance
   * (more forgiving of transpositions and length skew — the classic
   * name-matching measure). Output: (a_id, b_id, a_name, b_name, jw)
   * with jw on the 6-dp rounded grid, pairs at or above `minSim`
   * only. Same scale shape as fuzzyPairs: blocking bounds the
   * candidate relation, the codegen `jaro_winkler` kernel verifies
   * scan-locally.
   */
  def jaroPairs(
      df: DataFrame, idCol: String, nameCol: String,
      minSim: Double, blockKeyLen: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    candidates(df, idCol, nameCol, blockKeyLen, maxBucket)
      .withColumn("jw", round(
        graft.functions.GraftFunctions.jaroWinkler(
          col("a_name"), col("b_name")), 6))
      .filter(col("jw") >= minSim)
  }

  /** [[fellegiSunter]]'s comparison fields, in order: prefix-`k`
    * agreement, suffix-`k` agreement, length agreement. */
  val FsFields: Seq[String] = Seq("prefix", "suffix", "length")

  /** EM iterations for [[fsFit]] — fixed so the SQL oracle unrolls to
    * the same depth. */
  val FsIters = 8

  /** Fitted Fellegi–Sunter parameters, all on the exact micro grid:
    * per-field m (P(agree | match)) and u (P(agree | non-match))
    * probabilities and the match prevalence p, clamped to
    * [1, 999999] so no likelihood term can hit 0 or 1 exactly. */
  case class FsFit(mMicro: Seq[Long], uMicro: Seq[Long], pMicro: Long)

  /**
   * Comparison-pattern relation for Fellegi–Sunter (1969) record
   * linkage: the blocked candidate pairs reduced to their 3-field
   * agreement vector (γ_prefix, γ_suffix, γ_length) and counted per
   * pattern — at most 2³ = 8 rows regardless of corpus size. This one
   * aggregate is the only distributed pass the whole model needs.
   */
  def comparisonPatterns(
      df: DataFrame, idCol: String, nameCol: String,
      blockKeyLen: Int = 8, maxBucket: Option[Int] = None): DataFrame =
    candidates(df, idCol, nameCol, blockKeyLen, maxBucket)
      .select(
        (substring(col("a_name"), 1, blockKeyLen) ===
          substring(col("b_name"), 1, blockKeyLen)).cast("int").as("g1"),
        (substring(col("a_name"), -blockKeyLen, blockKeyLen) ===
          substring(col("b_name"), -blockKeyLen, blockKeyLen)).cast("int").as("g2"),
        (length(col("a_name")) === length(col("b_name"))).cast("int").as("g3"))
      .groupBy("g1", "g2", "g3").agg(count(lit(1)).as("n_pairs"))

  /**
   * Fixed-iteration EM fit of the Fellegi–Sunter latent-match model
   * over the ≤8 collected pattern rows (Winkler 1988's unsupervised
   * estimation). Engine-reproducible by the integral-state
   * discipline: each E-step posterior is micro-quantized
   * (`floor(w·10⁶ + 0.5)`) BEFORE any accumulation, the M-step sums
   * are exact integers (BigInt here, HUGEINT in the oracle), and the
   * new parameters are integral divisions clamped to [1, 999999] —
   * so m/u/p are bit-identical BIGINTs after every iteration in any
   * engine. The E-step double product runs in a FIXED left-to-right
   * order mirrored by the generated SQL.
   */
  def fsFit(patternRows: Seq[(Int, Int, Int, Long)], iters: Int = FsIters): FsFit = {
    def clamp(x: BigInt): Long = x.max(1).min(999999).toLong
    var m = Array(900000L, 900000L, 900000L)
    var u = Array(100000L, 100000L, 100000L)
    var p = 500000L
    var it = 0
    while (it < iters) {
      val a = Array.fill(3)(BigInt(0)); val b = Array.fill(3)(BigInt(0))
      var wSum = BigInt(0); var vSum = BigInt(0); var nSum = BigInt(0)
      patternRows.foreach { case (g1, g2, g3, n) =>
        val g = Array(g1, g2, g3)
        var num = p.toDouble / 1e6
        var den = (1000000L - p).toDouble / 1e6
        var k = 0
        while (k < 3) {
          num *= (if (g(k) == 1) m(k).toDouble / 1e6 else 1 - m(k).toDouble / 1e6)
          den *= (if (g(k) == 1) u(k).toDouble / 1e6 else 1 - u(k).toDouble / 1e6)
          k += 1
        }
        val wq = math.floor(num / (num + den) * 1000000 + 0.5).toLong
        k = 0
        while (k < 3) {
          if (g(k) == 1) { a(k) += BigInt(wq) * n; b(k) += BigInt(1000000L - wq) * n }
          k += 1
        }
        wSum += BigInt(wq) * n
        vSum += BigInt(1000000L - wq) * n
        nSum += n
      }
      m = Array.tabulate(3)(k => clamp(BigInt(1000000) * a(k) / wSum))
      u = Array.tabulate(3)(k => clamp(BigInt(1000000) * b(k) / vSum))
      p = clamp(wSum / nSum)
      it += 1
    }
    FsFit(m.toSeq, u.toSeq, p)
  }

  /** Per-pattern posterior card under a fit: (g1, g2, g3, n_pairs,
    * w_micro) — the quantized P(match | γ) every pair with that
    * pattern scores. Computed as a Spark expression mirroring the
    * E-step's fixed operation order. */
  def fsPatterns(patterns: DataFrame, fit: FsFit): DataFrame = {
    def term(g: Column, micro: Long): Column =
      when(g === 1, lit(micro).cast("double") / lit(1e6))
        .otherwise(lit(1.0) - lit(micro).cast("double") / lit(1e6))
    val num = Seq(0, 1, 2).foldLeft(lit(fit.pMicro).cast("double") / lit(1e6)) {
      (acc, k) => acc * term(col(s"g${k + 1}"), fit.mMicro(k))
    }
    val den = Seq(0, 1, 2).foldLeft(
      lit(1000000L - fit.pMicro).cast("double") / lit(1e6)) {
      (acc, k) => acc * term(col(s"g${k + 1}"), fit.uMicro(k))
    }
    patterns.select(col("g1"), col("g2"), col("g3"), col("n_pairs"),
      floor(num / (num + den) * 1000000 + lit(0.5)).cast("long").as("w_micro"))
  }

  /** Field-level weight card: (field, m_micro, u_micro, agree_weight,
    * disagree_weight) with the log₂ likelihood-ratio weights on the
    * package's 6-dp rounded-double grid. */
  def fsWeights(spark: org.apache.spark.sql.SparkSession, fit: FsFit): DataFrame = {
    import spark.implicits._
    FsFields.indices
      .map(k => (FsFields(k), fit.mMicro(k), fit.uMicro(k)))
      .toDF("field", "m_micro", "u_micro")
      .select(col("field"), col("m_micro"), col("u_micro"),
        round(log2(col("m_micro").cast("double") /
          col("u_micro").cast("double")), 6).as("agree_weight"),
        round(log2((lit(1000000L) - col("m_micro")).cast("double") /
          (lit(1000000L) - col("u_micro")).cast("double")), 6)
          .as("disagree_weight"))
  }

  /**
   * Entity assignment: every record mapped to the min record id of its
   * fuzzy-match component (singletons map to themselves). Pointer
   * doubling over the match edges — O(log diameter) rounds, and fuzzy
   * clusters are shallow (diameter ≤ a few edits) in practice.
   */
  def resolveEntities(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockKeyLen: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val pairs = fuzzyPairs(df, idCol, nameCol, maxDist, blockKeyLen, maxBucket)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val labels = ConnectedComponents.components(pairs, "src", "dst") // (id, component)
    df.select(col(idCol).as("record_id"), col(nameCol).as("name"))
      .join(labels.withColumnRenamed("id", "record_id"), Seq("record_id"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("record_id")))
      .select("record_id", "name", "entity_id")
  }
}
