package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Temperature-scaled source-mixture sampling — the "data recipe" stage
 * of a pretraining pipeline: given a corpus partitioned into sources
 * (crawl snapshots, books, code, ...), decide how many tokens to take
 * from each source and materialize a deterministic sample that hits
 * those per-source token budgets.
 *
 * The recipe follows the standard temperature formulation (sampling
 * weight w_s ∝ T_s^α for source token mass T_s): α = 1 reproduces the
 * natural distribution, α → 0 flattens toward uniform, α = 0.5 is the
 * widely used square-root rebalancing that up-weights small
 * high-quality sources against a dominating crawl. The global budget is
 * a fraction τ of the corpus's total tokens; source s receives
 * budget_s = floor(floor(τ·T) · w_s) tokens.
 *
 * Determinism at 100 TB, same contract as [[DatasetSplit]]: a row
 * survives iff its 24-bit md5 bucket falls under its source's keep
 * fraction — reproducible across reruns, engines, partitionings and
 * data order, incremental (new rows of a source land in the sample at
 * exactly the keep rate, no saved assignment table), and scan-local.
 * The per-row decision `bucket24 · T_s < budget_s · 2^24` is ALL
 * INTEGER arithmetic — no row-level float compare can flip between
 * engines (the driver oracle recomputes every verdict in DuckDB).
 * Floats appear only in the per-SOURCE weight, rounded to 4 decimals
 * on both sides before any budget is derived.
 *
 * Shape at scale: one scan → per-source token mass (hash aggregate,
 * map-side partials) → a sources-count-sized relation crossed with a
 * 1-row total — both broadcast — then the sample itself is a
 * scan-local filter on the corpus: zero shuffles of the big table,
 * changing the mixture never rewrites data.
 */
object MixtureSampling {

  /** 2^24-grained bucket from the row id: first 6 hex digits of
    * md5(id) — [[DatasetSplit.bucket]]'s contract at the finer
    * granularity token budgeting needs. */
  def bucket24(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long")

  /** Per-source recipe: (stratum, t_tokens, weight, token_budget).
    * `weight` is the α-temperature share rounded to 4 decimals;
    * `token_budget` the integer token allocation. α = 0.5 uses `sqrt`
    * (IEEE correctly-rounded, so engines agree bit-for-bit); other α
    * go through `pow`.
    *
    * The 4-decimal weight rounding is load-bearing (it is what keeps
    * the budgets engine-exact), and it cuts both ways: at τ = 1 a
    * multi-source recipe's budgets can land a hair UNDER each source's
    * mass, so the sample keeps ~everything rather than exactly
    * everything (±5e-5 of each source's tokens). A recipe that must
    * keep a source whole should say so directly — set that source's
    * `token_budget` ≥ `t_tokens` on the plan relation (budget ≥ mass
    * keeps every row, spec-pinned). */
  def mixturePlan(
      docs: DataFrame, stratumCol: String, tokens: Column,
      tau: Double, alpha: Double = 0.5): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1]: $tau")
    // |sources| rows, referenced twice (the recipe rows and the total
    // mass under them): materialize once, or the upstream corpus
    // aggregate — for recipe_to_batches the entire curation funnel —
    // derives once per reference.
    val per = docs.groupBy(col(stratumCol))
      .agg(sum(tokens).cast("long").as("t_tokens"))
      .localCheckpoint(true)
    def heat(t: Column) =
      if (alpha == 0.5) sqrt(t) else pow(t, lit(alpha))
    val tot = per.agg(
      sum(heat(col("t_tokens"))).as("z"),
      sum("t_tokens").cast("long").as("t_total"))
    per.crossJoin(broadcast(tot))
      .withColumn("weight", round(heat(col("t_tokens")) / col("z"), 4))
      .withColumn("token_budget",
        floor(floor(col("t_total") * tau) * col("weight")).cast("long"))
      .select(col(stratumCol), col("t_tokens"), col("weight"),
        col("token_budget"))
  }

  /** Materialize the sample: keep a row iff its bucket falls under its
    * source's keep fraction budget_s / T_s (sources with
    * budget_s ≥ T_s keep everything). Scan-local — the plan relation
    * broadcasts, the corpus never shuffles.
    *
    * The verdict `bucket24(id)·T_s < budget_s·2^24` is exact in
    * unbounded integers but the row-level Long multiply wraps once a
    * source's token mass passes 2^39 (~5.5e11 tokens) — far below
    * 100 TB corpora (~1e13 tokens). So the ratio is folded ONCE, on
    * the broadcast plan relation, into a per-source cutoff
    * `⌈budget_s·2^24 / T_s⌉` via exact DECIMAL(38) ceil-division
    * (budget clamped to mass first, so the cutoff tops out at 2^24
    * = keep-everything and always fits a Long). Per-row work is then
    * a single Long compare `bucket24(id) < cutoff` — same kept set
    * as the unbounded-integer verdict at every scale, still pure
    * integer arithmetic, still engine-portable. */
  def sampleByPlan(
      docs: DataFrame, idCol: String, stratumCol: String,
      plan: DataFrame): DataFrame = {
    // The T_s = 0 guard preserves the unbounded-integer verdict's own
    // degenerate cases (and keeps ANSI mode from throwing on the
    // integral division): a zero-mass source keeps everything when its
    // budget is positive (0·bucket < B·2^24) and nothing when the
    // budget is 0 too — engine-made plans always land in the latter.
    val limits = plan.withColumn("__graft_bucket_limit",
      when(col("t_tokens") > 0,
        expr("""(CAST(least(token_budget, t_tokens) AS DECIMAL(38,0))
               | * 16777216 + t_tokens - 1) div t_tokens""".stripMargin))
        .when(col("token_budget") > 0, lit(1L << 24))
        .otherwise(lit(0L)))
    docs.join(broadcast(limits), Seq(stratumCol))
      .filter(bucket24(col(idCol)) < col("__graft_bucket_limit"))
      .drop("t_tokens", "weight", "token_budget", "__graft_bucket_limit")
  }

  /**
   * Fractional-epoch upsampling — the other half of the recipe knob:
   * training mixes express per-source weights as EPOCH COUNTS
   * ("2.5 epochs of books, 0.8 of crawl"), materialized as row copies.
   * Source s with factor e yields floor(e) full copies of every doc
   * plus one extra copy for the deterministic ⌊1000·frac(e)⌉‰ id-bucket
   * slice — so the realized factor converges to e, every copy is
   * labeled with its epoch index, and the selection is reproducible /
   * incremental (same md5-bucket contract as [[sampleByPlan]]; the
   * fractional verdict `bucket24·1000 < promille·2^24` is pure BIGINT).
   *
   * Shape at scale: factors ride a broadcast; the fan-out is a
   * generate-and-explode INSIDE the scan stage — the corpus is read
   * once and never shuffled, and downstream consumers see copies
   * already spread across the same partitions as their originals.
   * Sources absent from `epochs` default to 0 (dropped) — mixes must
   * be explicit.
   */
  def upsampleEpochs(
      docs: DataFrame, idCol: String, stratumCol: String,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.values.forall(e => e >= 0 && e <= 100),
      s"epoch factors must be in [0, 100]: $epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val factors = epochs.toSeq.map { case (s, e) =>
      (s, math.floor(e).toLong, math.round((e - math.floor(e)) * 1000))
    }.toDF(stratumCol, "__graft_full", "__graft_promille")
    docs.join(broadcast(factors), Seq(stratumCol))
      .withColumn("__graft_copies",
        col("__graft_full") +
          when(bucket24(col(idCol)) * 1000 <
            col("__graft_promille") * lit(1L << 24), 1L).otherwise(0L))
      .filter(col("__graft_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__graft_copies") - 1)))
      .drop("__graft_full", "__graft_promille", "__graft_copies")
  }

  /** One-call recipe + realized-sample audit: the plan columns plus
    * what the deterministic sample actually took (`n_kept`,
    * `kept_tokens`) — the release-notes table for a data mixture.
    * `kept_tokens` tracks `token_budget` to within one document's
    * tokens per source (hash sampling, not a cumulative cut). */
  def mixtureReport(
      docs: DataFrame, idCol: String, stratumCol: String, tokens: Column,
      tau: Double, alpha: Double = 0.5): DataFrame = {
    val withTok = docs.select(col(stratumCol), col(idCol),
      tokens.cast("long").as("__graft_tok"))
    val plan = mixturePlan(withTok, stratumCol, col("__graft_tok"), tau, alpha)
    val kept = sampleByPlan(withTok, idCol, stratumCol, plan)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_kept"),
        sum("__graft_tok").cast("long").as("kept_tokens"))
    plan.join(kept, Seq(stratumCol), "left")
      .select(col(stratumCol), col("t_tokens"), col("weight"),
        col("token_budget"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /**
   * Largest-remainder (Hamilton) apportionment — allocate an integer
   * budget of `n` slots across strata proportionally to their counts,
   * EXACTLY using up the budget: quota = n·cnt/total on the micro
   * grid, every stratum gets floor(quota), and the leftover slots go
   * to the largest remainders (ties to the lexicographically least
   * stratum). The standard answer to "this eval/annotation budget is
   * 100 documents; how many from each language?" — deterministic,
   * integer-exact, and sums to n by construction.
   *
   * Shape: one count aggregate to |strata| rows, a broadcast total,
   * and a |strata|² broadcast self-join for the remainder rank —
   * strata are metadata-sized, so no window (an unpartitioned window
   * is the anti-pattern this repo polices even when the input is
   * tiny).
   */
  def apportion(
      docs: DataFrame, stratumCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val counts = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("cnt"))
    hamilton(counts.select(col("stratum"), col("cnt").as("w")), n)
      .select(col("stratum"), col("w").as("cnt"), col("quota_micro"),
        col("base"), col("rem_micro"), col("alloc"))
  }

  /**
   * Temperature-scaled apportionment — the multilingual-pretraining
   * mixture recipe (mC4 / XLM-R): allocate a budget of `n` slots
   * across strata proportionally to `cnt^α` with α < 1, which
   * UP-samples small strata (languages, sources) relative to raw
   * proportions — at α→0 every stratum gets an equal share, at α=1
   * this is plain Hamilton apportionment by count.
   *
   * α is a rational `alphaNum/alphaDen`, evaluated as one double
   * division (IEEE-identical in any engine); the weight `cnt^α`
   * follows the package's quantize-the-transcendental discipline:
   * computed in double, scaled to integer micros with round(·, 0),
   * then every downstream step (Hamilton quotas, remainders, ties)
   * is exact integer/DECIMAL arithmetic. Caveat, shared with every
   * log10 card: `pow` is not IEEE-correctly-rounded (unlike `sqrt`,
   * which [[mixturePlan]]'s α = 0.5 path uses for that reason), so an
   * engine pair can in principle disagree by one micro when
   * `cnt^α·10⁶` lands within an ulp of a rounding boundary — same
   * accepted risk class as the 6-dp log rounding. Same shape as
   * [[apportion]]:
   * one count aggregate to |strata| rows, broadcast total, |strata|²
   * broadcast remainder rank — no windows, nothing driver-side.
   */
  def temperatureApportion(
      docs: DataFrame, stratumCol: String, n: Int,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(alphaNum > 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"temperature must satisfy 0 < alphaNum/alphaDen <= 1, " +
        s"got $alphaNum/$alphaDen")
    val counts = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("cnt"))
    val weighted = counts.select(col("stratum"), col("cnt"),
      expr(s"CAST(round(pow(CAST(cnt AS DOUBLE), " +
        s"CAST($alphaNum AS DOUBLE) / CAST($alphaDen AS DOUBLE)) " +
        s"* 1000000, 0) AS BIGINT)").as("w"))
    hamilton(weighted.select(col("stratum"), col("w")), n)
      .join(weighted.select(col("stratum"), col("cnt")), "stratum")
      .select(col("stratum"), col("cnt"), col("w").as("weight_micro"),
        col("alloc"))
      .orderBy("stratum")
  }

  /** Hamilton core over an arbitrary non-negative weight relation
    * (stratum, w): quota = n·w/Σw on the micro grid, floor + largest
    * remainders (ties to the least stratum). Output: (stratum, w,
    * quota_micro, base, rem_micro, alloc). */
  private def hamilton(weights: DataFrame, n: Int): DataFrame = {
    val total = weights.agg(sum("w").as("__total"))
    // quota product in DECIMAL(38,0): n·w·1e6 in BIGINT silently
    // wraps past ~9.2e18/(n·1e6) weight (reachable at the 100 TB
    // target) — the decimal widening keeps the product exact to 38
    // digits and `div` lands back on BIGINT, so no decimal reaches
    // the output schema (the r8 dtype lesson)
    val quotas = weights.crossJoin(broadcast(total))
      .withColumn("quota_micro",
        expr(s"(CAST($n AS DECIMAL(38,0)) * w * 1000000) div __total"))
      .withColumn("base", expr("quota_micro div 1000000"))
      .withColumn("rem_micro", expr("quota_micro % 1000000"))
      .drop("__total")
    val leftover = quotas.agg(
      (lit(n.toLong) - sum("base")).as("__left"))
    // remainder rank without a window: count strictly-better strata
    val better = quotas.select(col("stratum").as("__s2"),
      col("rem_micro").as("__r2"))
    val ranked = quotas.join(broadcast(better),
        col("__r2") > col("rem_micro") ||
          (col("__r2") === col("rem_micro") && col("__s2") < col("stratum")),
        "left")
      .groupBy("stratum", "w", "quota_micro", "base", "rem_micro")
      .agg(count(col("__s2")).as("__nbetter"))
    ranked.crossJoin(broadcast(leftover))
      .withColumn("alloc",
        col("base") + when(col("__nbetter") < col("__left"), 1L)
          .otherwise(0L))
      .select(col("stratum"), col("w"), col("quota_micro"),
        col("base"), col("rem_micro"), col("alloc"))
  }

  /** Deterministic integer square root seeded by the IEEE double root
    * and corrected one step each way with exact DECIMAL compares:
    * bitwise engine-identical ALWAYS (both engines take the same
    * double), and the true ⌊√x⌋ whenever x fits the double-exact
    * range (< 2^53). Returns BIGINT. */
  private def isqrtDec(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("decimal(38,0)")
    val s1 = when(s0 * s0 > x, s0 - lit(1)).otherwise(s0)
    when((s1 + lit(1)) * (s1 + lit(1)) <= x, s1 + lit(1)).otherwise(s1)
      .cast("long")
  }

  /**
   * Neyman (optimal) allocation — the variance-aware refinement of
   * proportional apportionment (Neyman 1934; Cochran, Sampling
   * Techniques §5.5): a fixed sample budget n is split
   * n_h ∝ N_h·σ_h, so high-variance strata get more of the budget and
   * zero-variance strata (whose mean one sample pins) get none. The
   * identity N_h·σ_h = √(N_h·Σv² − (Σv)²) keeps the weight a single
   * integer square root of EXACT integer moments — no per-stratum
   * float variance ever forms. When every stratum has zero variance
   * the weights fall back to the counts (plain proportional
   * allocation). `valueCol` must be integral (quantize upstream).
   *
   * Shape at 100 TB: one moment aggregate to |strata| rows (map-side
   * partials over the scan), then the Hamilton core's metadata-sized
   * broadcast joins. Output: (stratum, n_h, weight, alloc).
   */
  def neymanAllocation(
      docs: DataFrame, stratumCol: String, valueCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val m = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(
        count(lit(1)).as("n_h"),
        sum(col(valueCol).cast("long")).as("s1"),
        sum(expr(s"CAST(CAST($valueCol AS BIGINT) AS DECIMAL(38,0)) * " +
          s"CAST($valueCol AS BIGINT)")).as("s2"))
      .withColumn("radicand",
        expr("CAST(n_h AS DECIMAL(38,0)) * s2 - " +
          "CAST(s1 AS DECIMAL(38,0)) * s1"))
      .withColumn("sigma_w", isqrtDec(col("radicand")))
    val anyVar = m.agg(sum("sigma_w").as("__sw"))
    val weights = m.crossJoin(broadcast(anyVar))
      .select(col("stratum"), col("n_h"),
        when(col("__sw") > 0, col("sigma_w")).otherwise(col("n_h"))
          .as("w"))
    hamilton(weights.select("stratum", "w"), n)
      .join(weights.select("stratum", "n_h"), "stratum")
      .select(col("stratum"), col("n_h"), col("w").as("weight"),
        col("alloc"))
  }
}
