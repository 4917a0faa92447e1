package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic Poisson bootstrap — confidence intervals for eval
 * metrics at corpus scale. The classical bootstrap (resample n items
 * WITH replacement, B times) needs dense indexing and random draws —
 * both hostile to a distributed scan. The Poisson bootstrap
 * (Chamandy et al., "Estimating Uncertainty for Massive Data
 * Streams") replaces per-rep draws with a per-(example, rep)
 * multiplicity ~ Poisson(1): no indexing, no coordination, one scan
 * of the example set fans out to B replicas and aggregates.
 *
 * Determinism: the multiplicity comes from the same engine-portable
 * seeded-hash trick as [[DatasetSplit]]/[[ObjectivePrep]] — a 16-bit
 * md5 value of (id:rep) pushed through a fixed inverse-CDF table for
 * Poisson(1) — so every rerun, partitioning, and engine resamples
 * IDENTICALLY, and a SQL oracle can re-derive the whole card. Sums
 * are exact integers; each rep mean is one final division.
 *
 * Shape at 100 TB: |examples| × B rows ride the scan with map-side
 * partial aggregation into B groups — the exchange carries B rows per
 * partition. No window, no collect, no RNG state.
 */
object Bootstrap {

  /** Cumulative 16-bit thresholds for Poisson(1): P(X ≤ k)·2^16
    * rounded, k = 0..7 (multiplicities beyond 8 are ~1e-5 and clamp).
    * Shared verbatim with the SQL oracle. */
  val PoissonCum: Seq[Long] =
    Seq(24113L, 48226L, 60273L, 64292L, 65296L, 65497L, 65531L, 65535L)

  /** 16-bit md5 value of (id, rep) — uniform 0..65535, identically
    * computable in any engine with md5 + string ops. */
  def hash16(id: Column, rep: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"),
      rep.cast("string"))), 1, 4), 16, 10).cast("long")

  /** Inverse-CDF lookup: multiplicity for a uniform 16-bit value. */
  def multiplicityFor(h: Column): Column =
    PoissonCum.zipWithIndex.foldRight(lit(8): Column) {
      case ((t, k), rest) => when(h < t, lit(k)).otherwise(rest)
    }

  /**
   * Per-replica bootstrap card over per-example scores: (rep, n_eff,
   * sum_score, mean_score). The caller derives CI bounds from the B
   * rep means (exact percentile machinery or a plain min/max band).
   */
  def poissonBootstrap(examples: DataFrame, idCol: String,
      scoreCol: String, reps: Int): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    val mult = multiplicityFor(hash16(col(idCol), col("rep")))
    examples
      .select(col(idCol), col(scoreCol).cast("long").as("__score"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("rep"))
      .withColumn("__mult", mult)
      .groupBy("rep")
      .agg(
        sum(col("__mult")).cast("long").as("n_eff"),
        sum(col("__mult") * col("__score")).cast("long").as("sum_score"))
      .withColumn("mean_score",
        round(col("sum_score").cast("double") / col("n_eff").cast("double"), 6))
  }
}
