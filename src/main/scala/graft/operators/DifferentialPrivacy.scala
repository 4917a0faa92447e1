package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Differentially-private count release via the (truncated) geometric
 * mechanism — the discrete analogue of Laplace noise and the standard
 * mechanism for integer counts (Ghosh, Roughgarden & Sundararajan
 * 2009): releasing per-group corpus statistics (docs per source,
 * users per cohort) without exposing any single row's presence is a
 * routine governance requirement once corpus datacards leave the
 * building. Sits beside the k-anonymity/suppression rows
 * ([[Anonymity]]) as the perturbation (vs generalization) branch of
 * the privacy toolkit.
 *
 * Determinism discipline: nothing samples at runtime. The noise for a
 * group is a pure function of its key — a 16-bit uniform from the
 * md5 of `"dp:" + key`, pushed through the mechanism's inverse CDF.
 * The CDF itself is precomputed ONCE here (in [[thresholds]], the
 * only place `exp` runs) into exact integer thresholds on the u16
 * grid; both the Spark expression and the SQL oracle consume those
 * INTEGERS, so engines never evaluate a transcendental at query time
 * and results are bit-identical. (A production release would swap
 * the seeded hash for a drawn-once secret seed; the mechanism,
 * truncation, and integer-threshold evaluation are unchanged.)
 *
 * Noise distribution: two-sided geometric with P(k) ∝ alpha^|k|,
 * alpha = exp(-eps), truncated to |k| ≤ [[MaxNoise]] and
 * renormalized (truncation at 4/eps keeps the clipped tail mass
 * < 2·alpha^(K+1)/(1+alpha) ≈ 0.03% at eps = 0.5). Sensitivity of a
 * partition-disjoint count query is 1, so the release is
 * eps-DP up to the documented truncation.
 *
 * Shape at scale: the true counts are one hash aggregate; the noise
 * is a scan-local projection over the ≤|groups| aggregate rows. No
 * extra shuffle, no driver state.
 */
object DifferentialPrivacy {

  val Eps = 0.5
  val MaxNoise = 16

  /**
   * Inverse-CDF thresholds on the u16 grid: `(k, t)` sorted by k,
   * noise(u16) = the smallest k with u16 < t. Exact integers — the
   * cross-engine contract.
   */
  lazy val thresholds: Seq[(Int, Long)] = {
    val alpha = math.exp(-Eps)
    val ks = -MaxNoise to MaxNoise
    val weights = ks.map(k => math.pow(alpha, math.abs(k)))
    val z = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / z)
    ks.zip(cum).map { case (k, c) =>
      k -> math.min(65536L, math.round(c * 65536.0))
    }
  }

  /** 16-bit seeded uniform for a group key: first 4 md5 nibbles of
    * `"dp:" + key` (the same md5-seeding family as the bootstrap and
    * CMS rows). */
  def u16(key: Column): Column =
    conv(substring(md5(concat(lit("dp:"), key)), 1, 4), 16, 10).cast("long")

  /** Chained-threshold inverse CDF as a codegen CASE expression. */
  def noise(u: Column): Column =
    thresholds.init.foldRight(lit(MaxNoise): Column) { case ((k, t), rest) =>
      when(u < t, k).otherwise(rest)
    }.cast("long")

  /** The same inverse CDF as a SQL CASE over the same integers — the
    * oracle half, generated from one source of truth. */
  def noiseCaseSql(uExpr: String): String =
    thresholds.init.map { case (k, t) =>
      s"WHEN $uExpr < $t THEN $k"
    }.mkString("CASE ", " ", s" ELSE $MaxNoise END")

  /**
   * eps-DP noisy counts per group: (group key, true n, u16, noise,
   * noisy_n, eps). `noisy_n` is clamped at 0 (a count release is
   * non-negative by post-processing, which preserves DP). The true
   * `n` column exists for the verification gate; a real release
   * drops it — that is the point of the mechanism.
   */
  def noisyCounts(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    val key = concat_ws(":", keyCols.map(c => col(c).cast("string")): _*)
    val u = u16(key)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("u16", u)
      .withColumn("noise", noise(col("u16")))
      .withColumn("noisy_n", greatest(col("n") + col("noise"), lit(0L)))
      .withColumn("eps", lit(Eps))
  }
}
