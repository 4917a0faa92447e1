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
   * Percentile confidence interval over [[poissonBootstrap]]'s
   * replica means — the missing last step of the bootstrap card
   * ("the caller derives CI bounds" above, now derived here, on the
   * SAME hash16/PoissonCum machinery — one inverse-CDF table, one
   * weight discipline, shared verbatim with the SQL oracle). The
   * interval is the type-1 empirical quantile pair at ranks
   * ⌈0.025·B'⌉ and ⌈0.975·B'⌉ over the B' kept replicas, ranked by
   * (mean, rep) so ties are total; ranks are computed in EXACT
   * integers — ceil(B'·0.025) in doubles flips at B' multiples of 40
   * (200·0.025 lands an ulp above 5.0). Replicas whose weights all
   * drew zero are dropped (probability e^−n per replica; the oracle
   * drops them identically), and an empty example relation yields an
   * EMPTY result, not a row of nulls.
   *
   * Shape: [[poissonBootstrap]]'s one explode-aggregate pass to B
   * rows, then one window over that bounded relation on the pinned
   * single-partition key (row_number + count share the partitioning,
   * so the replica relation is consumed once — no second aggregate).
   *
   * Output: one row (n_units, n_reps, mean_score, lo, hi).
   */
  def poissonBootstrapCi(
      examples: DataFrame, idCol: String, scoreCol: String,
      reps: Int = 199): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    val base = examples.filter(col(scoreCol).isNotNull)
    val m = base
      .agg(count(lit(1)).as("n_units"),
        sum(col(scoreCol).cast("long")).as("__sy"))
      .select(col("n_units"),
        round(col("__sy").cast("double") / col("n_units"), 6)
          .as("mean_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Retrieval.singlePartitionKey(col("rep")))
    val ranked = poissonBootstrap(base, idCol, scoreCol, reps)
      .filter(col("n_eff") > 0)
      .withColumn("__rn",
        row_number().over(w.orderBy(col("mean_score"), col("rep"))))
      .withColumn("n_reps", count(lit(1)).over(w))
    ranked
      .filter(col("__rn") === expr("(n_reps * 25 + 999) div 1000") ||
        col("__rn") === expr("(n_reps * 975 + 999) div 1000"))
      .groupBy("n_reps")
      .agg(min("mean_score").as("lo"), max("mean_score").as("hi"))
      .crossJoin(broadcast(m))
      .select(col("n_units"), col("n_reps"), col("mean_score"),
        col("lo"), col("hi"))
  }

  /**
   * TWO-SAMPLE Fisher randomization test for a mean difference — the
   * between-group companion to the PAIRED sign-flip
   * [[permutationTest]] below (different null: label exchangeability
   * across two groups, vs per-item sign symmetry; both live here so
   * the resampling family shares one module — the BenfordAudit
   * consolidation discipline). Re-assign the observed group labels
   * `trials` times and count how often a re-randomized |difference|
   * reaches the observed one — no variance model, the inference that
   * matches how an A/B assignment was actually made.
   *
   * Determinism: trial t ranks units by md5("perm:seed:t:unit")
   * (ties on the unit string) and labels the first n_a ranks
   * pseudo-A — the engine's seeded-md5-rank discipline, replayed
   * verbatim in SQL. The statistic avoids division: with group sizes
   * fixed across trials, mean_A − mean_B compares on the common
   * n_a·n_b denominator, so d = |sum_A·n_b − sum_B·n_a| (exact
   * DECIMAL) and "d_t ≥ d_obs" is an integer comparison. p is the
   * add-one estimator (1 + #{d_t ≥ d_obs}) / (trials + 1) on the
   * micro grid ([[permutationTest]]'s Phipson–Smyth convention).
   * Degenerate inputs are total: an empty group (or empty input)
   * gives d_obs = 0, every trial trivially reaches it, p = 1 — and
   * the SQL oracle reproduces exactly that.
   *
   * Shape at 100 TB: randomization inference runs on the bounded
   * EXPERIMENT-UNIT relation (the [[StatTests.cuped]] convention —
   * users, not events): trials·|units| slim rows, a window over
   * `trials` bounded partitions, one `trials`-row reduction. Unlike
   * [[poissonBootstrapCi]] this NEEDS a per-trial rank (fixed group
   * sizes), so its unit-count comfort zone is smaller — prefer the
   * bootstrap when only an interval is needed.
   *
   * Report-column bound: d_obs is BIGINT; past |Σy|·n ≈ 9·10¹⁸ the
   * non-ANSI DECIMAL(38,0)→BIGINT cast yields NULL here while the
   * oracle's HUGEINT→BIGINT cast errors — size the value grid to the
   * unit count so neither is reachable.
   *
   * Output: one row (n_a, n_b, d_obs, n_ge, p_micro).
   */
  def twoSampleRandomizationTest(
      units: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String, unitCol: String,
      trials: Int = 199, seed: Long = 42L): DataFrame = {
    require(trials >= 1 && trials <= 10000,
      s"trials must be in [1, 10000], got $trials")
    val base = units
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(col(unitCol).cast("string").as("__u"),
        (col(groupCol) === a).as("__ga"),
        col(valueCol).cast("decimal(38,0)").as("__y"))
    val zero = lit(0).cast("decimal(38,0)")
    val m = base.agg(
      coalesce(sum(when(col("__ga"), 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(!col("__ga"), 1L).otherwise(0L)), lit(0L)).as("n_b"),
      coalesce(sum(when(col("__ga"), col("__y")).otherwise(zero)), zero)
        .as("__sa"),
      coalesce(sum(when(!col("__ga"), col("__y")).otherwise(zero)), zero)
        .as("__sb"),
      coalesce(sum(col("__y")), zero).as("__st"))
      .select(col("n_a"), col("n_b"), col("__st"),
        abs(col("__sa") * col("n_b") - col("__sb") * col("n_a"))
          .as("__dobs"))
    val ranked = base
      .select(col("__u"), col("__y"),
        explode(expr(s"sequence(1, $trials)")).as("__t"))
      .withColumn("__h", md5(concat(lit(s"perm:$seed:"),
        col("__t").cast("string"), lit(":"), col("__u"))))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__t").orderBy(col("__h"), col("__u"))))
    // the rank condition lives INSIDE the aggregate (not a filter
    // before it) so a trial whose pseudo-A is empty — n_a = 0, a
    // degenerate but legal input — still produces its group row with
    // sat = 0 instead of vanishing
    val perTrial = ranked
      .crossJoin(broadcast(m))
      .groupBy("__t")
      .agg(sum(when(col("__rn") <= col("n_a"), col("__y"))
        .otherwise(zero)).as("__sat"))
      .crossJoin(broadcast(m))
      .select(col("__t"),
        (abs(col("__sat") * col("n_b") -
          (col("__st") - col("__sat")) * col("n_a")) >= col("__dobs"))
          .as("__ge"))
    perTrial
      // empty unit relation ⇒ no trial rows; every randomization of
      // nothing trivially reproduces d_obs = 0, so n_ge = trials, p = 1
      .agg(coalesce(sum(when(col("__ge"), 1L).otherwise(0L)),
        lit(trials.toLong)).as("n_ge"))
      .crossJoin(broadcast(m))
      .select(col("n_a"), col("n_b"),
        col("__dobs").cast("long").as("d_obs"), col("n_ge"),
        expr(s"CAST((1000000 * (1 + n_ge)) div ${trials + 1} AS BIGINT)")
          .as("p_micro"))
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
