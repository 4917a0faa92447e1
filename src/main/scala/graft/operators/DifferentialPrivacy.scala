package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Truncated-geometric noisy counts — the discrete analogue of Laplace
 * noise and the standard mechanism for integer counts (Ghosh,
 * Roughgarden & Sundararajan 2009): releasing per-group corpus
 * statistics (docs per source, users per cohort) without exposing any
 * single row's presence is a routine governance requirement once
 * corpus datacards leave the building. Sits beside the
 * k-anonymity/suppression rows ([[Anonymity]]) as the perturbation
 * (vs generalization) branch of the privacy toolkit.
 *
 * PRIVACY CONTRACT — read this first: the noise for a group is a
 * keyed hash of `secretSeed + key`, so the release is eps-DP ONLY
 * while `secretSeed` stays secret (an adversary who knows the seed
 * recomputes the noise exactly and subtracts it — zero privacy). A
 * production release draws the seed once from a CSPRNG and never
 * publishes it. The driver/oracle rows in this repo pass a FIXED,
 * VISIBLE seed so the cross-engine gate can replay the noise — those
 * rows are a deterministic mechanism SIMULATION (they verify the
 * mechanism's arithmetic, not a privacy guarantee), which is why the
 * true `n` rides along in the output there.
 *
 * Determinism discipline: nothing samples at runtime. A 16-bit
 * uniform comes from the md5 of the seeded key and is pushed through
 * the mechanism's inverse CDF. The CDF itself is precomputed ONCE
 * here (in [[thresholds]], the only place `exp` runs) into exact
 * integer thresholds on the u16 grid; both the Spark expression and
 * the SQL oracle consume those INTEGERS, so engines never evaluate a
 * transcendental at query time and results are bit-identical.
 *
 * Key encoding: group columns join on the 0x1F unit separator with a
 * 0x00 sentinel for NULL (the same collision-free scheme as
 * [[Snapshot]]'s SCD2 fingerprint) — `("a:b","c")` never collides
 * with `("a","b:c")`, and a NULL column yields a distinct key
 * instead of silently vanishing from the hash.
 *
 * Noise distribution: two-sided geometric with P(k) ∝ alpha^|k|,
 * alpha = exp(-eps), truncated to |k| ≤ [[MaxNoise]] and
 * renormalized (truncation at 4/eps keeps the clipped tail mass
 * < 2·alpha^(K+1)/(1+alpha) ≈ 0.03% at eps = 0.5). Sensitivity of a
 * partition-disjoint count query is 1, so with a secret seed the
 * release is eps-DP up to the documented truncation.
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

  /** Collision-free key encoding for the seeded hash: columns joined
    * on the 0x1F unit separator, NULL mapped to the 0x00 sentinel
    * (never collides with a real string; a NULL column changes the
    * key instead of vanishing — unlike `concat_ws(":")`). */
  def keyEncoding(keyCols: Seq[String]): Column =
    concat_ws("\u001f",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  /** 16-bit seeded uniform for a group key: first 4 md5 nibbles of
    * `secretSeed <US> key` (the same md5-seeding family as the
    * bootstrap and CMS rows). The seed is REQUIRED: pass a
    * drawn-once secret for a real release; a fixed visible seed
    * makes this a replayable simulation (see the class doc). */
  def u16(key: Column, secretSeed: String): Column =
    conv(substring(
      md5(concat(lit(secretSeed), lit("\u001f"), key)), 1, 4), 16, 10)
      .cast("long")

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
   * Noisy counts per group: (group key, true n, u16, noise, noisy_n,
   * eps). `noisy_n` is clamped at 0 (a count release is non-negative
   * by post-processing, which preserves DP). The true `n` column
   * exists for the verification gate; a real release drops it — that
   * is the point of the mechanism. eps-DP only while `secretSeed`
   * stays secret (class doc); a visible seed makes this a replayable
   * mechanism simulation.
   */
  def noisyCounts(df: DataFrame, keyCols: Seq[String],
      secretSeed: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    val u = u16(keyEncoding(keyCols), secretSeed)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("u16", u)
      .withColumn("noise", noise(col("u16")))
      .withColumn("noisy_n", greatest(col("n") + col("noise"), lit(0L)))
      .withColumn("eps", lit(Eps))
  }
}
