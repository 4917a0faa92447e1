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

  /**
   * Paired permutation (sign-flip) test per group — the
   * distribution-free significance test for "did metric B beat metric
   * A on the same items" when the metric is a NUMBER (McNemar covers
   * the boolean case): under H₀ each paired difference d_i is
   * symmetric around 0, so flipping signs at random regenerates the
   * null. The flips are the md5 seeded-hash trick (bit of
   * hash16(id, rep)), so every engine/rerun/partitioning permutes
   * IDENTICALLY and the SQL oracle re-derives the whole card. The
   * add-one p-value (Phipson & Smyth 2010) never reports 0.
   *
   * All-integer: |Σ ± d_i| per rep is an exact sum; the p-value is
   * one integral division to the micro grid. Shape: the |items| × B
   * grid rides the scan with map-side partials into B·|groups| rows —
   * the poissonBootstrap contract.
   *
   * Output per group: (n, obs_abs, n_ge, reps, p_micro).
   */
  def permutationTest(
      pairs: DataFrame, groupCol: String, idCol: String,
      diffCol: String, reps: Int): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    val obs = pairs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        abs(sum(col(diffCol).cast("long"))).as("obs_abs"))
    val flip = when(hash16(col(idCol), col("rep")) % 2 === 0, 1L)
      .otherwise(-1L)
    val perms = pairs
      .select(col(groupCol), col(idCol),
        col(diffCol).cast("long").as("__d"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("rep"))
      .groupBy(col(groupCol), col("rep"))
      .agg(abs(sum(flip * col("__d"))).as("perm_abs"))
    perms.join(broadcast(obs), groupCol.toString :: Nil)
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"), first(col("obs_abs")).as("obs_abs"),
        sum(when(col("perm_abs") >= col("obs_abs"), 1L).otherwise(0L))
          .as("n_ge"))
      .withColumn("reps", lit(reps.toLong))
      .withColumn("p_micro", expr(
        s"(CAST(n_ge + 1 AS DECIMAL(38,0)) * 1000000) div (reps + 1)"))
  }

  /**
   * Delete-one-GROUP jackknife (Quenouille 1956 / Tukey 1958) for a
   * RATIO metric — the variance tool the bootstrap family here
   * doesn't cover: ratio estimators (clicks-per-view, tokens-per-doc,
   * dup-rate) are biased and their variance is NOT the binomial
   * formula, because both numerator and denominator vary together and
   * observations correlate WITHIN a group (a user, a domain).
   * Deleting whole groups respects that correlation — the "cluster
   * jackknife" every A/B platform ships.
   *
   * All integer arithmetic on the micro grid: per-group sums (a_g,
   * b_g), totals (A, B, n); the leave-one-out ratio
   * `r_g = (10⁶·(A−a_g)) div (B−b_g)`; pseudo-values
   * `p_g = n_used·R − (n_used−1)·r_g`; and the jackknife variance
   * `(n·Σp² − (Σp)²) div (n²(n−1))` in DECIMAL(38,0) — micro² units,
   * deliberately variance (not SE): the square root is irrational and
   * would break the exactness contract. Groups whose deletion empties
   * the denominator are excluded and counted (`n_groups` vs
   * `n_used`).
   *
   * Shape: one corpus aggregate to |groups| rows, a 1-row broadcast
   * of totals, scan-local pseudo-values, one final 1-row aggregate.
   */
  def jackknifeRatio(
      df: DataFrame, groupCol: String, numCol: String,
      denCol: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val g = df.groupBy(col(groupCol).as("__g")).agg(
      sum(col(numCol).cast("long")).as("a"),
      sum(col(denCol).cast("long")).as("b"))
    val tot = g.agg(sum("a").as("ta"), sum("b").as("tb"),
      count(lit(1)).as("n_groups"))
    val loo = g.crossJoin(broadcast(tot))
      .filter(col("tb") - col("b") > 0)
      .withColumn("r_loo",
        expr(s"(1000000 * CAST(ta - a AS $dec)) div (tb - b)"))
    val used = loo.agg(count(lit(1)).as("n_used")).crossJoin(broadcast(tot))
      .withColumn("ratio_micro", expr(s"(1000000 * CAST(ta AS $dec)) div tb"))
    val pseudo = loo.crossJoin(broadcast(
        used.select("n_used", "ratio_micro")))
      .withColumn("p",
        expr(s"CAST(n_used AS $dec) * ratio_micro - (n_used - 1) * r_loo"))
    pseudo.agg(
        sum(expr(s"CAST(p AS $dec)")).as("sp"),
        sum(expr(s"CAST(p AS $dec) * p")).as("sp2"))
      .crossJoin(broadcast(used))
      .select(
        col("n_groups").cast("long").as("n_groups"),
        col("n_used").cast("long").as("n_used"),
        col("ratio_micro").cast("long").as("ratio_micro"),
        expr("CAST(sp AS DECIMAL(38,0)) div n_used").as("jack_mean_micro"),
        when(col("n_used") > 1,
          expr(s"(CAST(n_used AS $dec) * sp2 - sp * sp) div " +
            s"(CAST(n_used AS $dec) * n_used * (n_used - 1))"))
          .otherwise(0L).as("var_jack_micro2"))
  }

  /**
   * Multiple-testing corrections over a family of per-slice p-values
   * — the step a metrics dashboard skips at its peril once it tests
   * one hypothesis per source/segment. Three standard adjustments on
   * the exact micro grid, clamped at 10⁶ (p = 1):
   *
   *  - Bonferroni: `min(p·m, 1)` — FWER, maximally conservative;
   *  - Holm (1979) step-down: running MAX over ranks j ≤ i of
   *    `min((m−j+1)·p_(j), 1)` — uniformly better FWER;
   *  - Benjamini–Hochberg (1995) step-up: running MIN over ranks
   *    j ≥ i of `min(⌊p_(j)·m / j⌋, 1)` — FDR, the large-family
   *    default.
   *
   * Ranks order by (p, group) so ties are deterministic; the
   * integral `div` keeps every adjusted value an exact BIGINT both
   * engines agree on. The family is ≤ |slices| rows, so the ordered
   * windows run on a bounded relation.
   */
  def multipleTesting(
      pvals: DataFrame, groupCol: String, pCol: String,
      alphaMicro: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1)).orderBy(col(pCol), col(groupCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSuf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pvals
      .select(col(groupCol), col(pCol).cast("long").as("p_micro"))
      .withColumn("m",
        count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("bonferroni_micro",
        least(col("p_micro") * col("m"), lit(1000000L)))
      .withColumn("holm_micro",
        max(least((col("m") - col("rnk") + 1) * col("p_micro"),
          lit(1000000L))).over(wCum))
      .withColumn("bh_micro",
        min(least(expr("(p_micro * m) div rnk"), lit(1000000L))).over(wSuf))
      .withColumn("reject_bh", col("bh_micro") <= alphaMicro)
      .drop("m")
  }
}
