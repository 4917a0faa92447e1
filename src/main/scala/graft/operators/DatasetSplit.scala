package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting for training pipelines: every row is
 * assigned to train/val/test by hashing its ID — not by `rand()`.
 *
 * Why hash, not random, at 100 TB:
 *  - reproducible: the split is a pure function of the id, stable
 *    across reruns, engines, partitionings, and data order — the val
 *    set never bleeds into train when the pipeline is re-executed;
 *  - incremental: newly ingested rows land in the same split forever
 *    without consulting any saved assignment table;
 *  - scan-local: one codegen'd projection per row, no shuffle, no
 *    state, no driver involvement.
 *
 * The bucket is the first 4 hex digits of md5(id) mod 100 — md5 is
 * available in every engine, so the assignment is externally
 * recomputable (the driver oracle recomputes it in DuckDB).
 */
object DatasetSplit {

  /** 0–99 bucket from the row id (any type; cast to its canonical
    * string form first so engines agree on the hashed bytes). */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100

  /**
   * Adds `bucket` and `split` columns. Percentages are cut points:
   * bucket < trainPct → train; < trainPct + valPct → val; else test.
   */
  def assignSplits(
      df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val b = bucket(col(idCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /**
   * Deterministic global training shuffle — the data-ordering stage of
   * a training pipeline: every row gets a `(shard, pos)` coordinate
   * such that reading shards in order, each sorted by `pos`, visits the
   * corpus in a fixed pseudo-random permutation. Seeded md5, not
   * `rand()`, for the same reasons as [[assignSplits]]: the order is
   * reproducible across reruns/engines/partitionings, and data loaders
   * can re-derive any row's coordinate independently.
   *
   * Why two-level at 100 TB: a single global `ORDER BY hash` is one
   * total sort — a full-corpus range exchange. Sharding first means one
   * hash-partitioned shuffle on `shard` and an independent in-partition
   * sort per shard (Spark's window does exactly this); shards are
   * streamed to the trainer in shard order, which IS the standard
   * shard-shuffled loading scheme (shuffle shards globally, shuffle
   * rows within a shard — here both levels come from the same hash).
   */
  /** The [[shuffleOrder]] shard key alone — for consumers that need
    * the deterministic shard assignment without paying the per-shard
    * position sort (e.g. shard-level manifests). */
  def shardKey(id: Column, numShards: Int, seed: String = "graft"): Column = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    conv(substring(
      md5(concat(lit(seed), lit(":"), id.cast("string")).cast("binary")),
      1, 4), 16, 10).cast("long") % numShards
  }

  def shuffleOrder(
      df: DataFrame, idCol: String, numShards: Int,
      seed: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    val shard = (conv(substring(h, 1, 4), 16, 10).cast("long") % numShards).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /**
   * Balanced per-stratum sampling: EXACTLY `n` rows per stratum (or
   * all of a smaller stratum), picked deterministically — the
   * eval-set / class-balance construction ("200 documents per
   * language for the human-review batch"). Rate-based sampling
   * ([[stratifiedSample]]) cannot promise exact counts; this ranks
   * each stratum's rows by seeded md5 (ties → id) and keeps the first
   * `n`, so the pick is reproducible across engines and stable under
   * corpus growth EXCEPT that new rows hashing into the top-n evict
   * the rank-n row — the standard reservoir trade-off.
   *
   * Shape at scale: one hash exchange on the stratum plus an
   * in-partition sort (Spark's window), same as [[shuffleOrder]] —
   * never a global sort. When a stratum outgrows a task at
   * `n` ≪ stratum size, pass `prefilterPct`: the sort then only sees
   * the hash-smallest `prefilterPct`% of each stratum — an exact
   * PREFIX of the rank order (fixed-length lowercase hex compares
   * bytewise), so any stratum keeping ≥ n survivors has its true
   * top-n inside the prefix, and strata that come up short are
   * re-ranked unfiltered (a scan-local second pass against a
   * broadcast stratum list). EXACT for every input — the prefilter is
   * a performance knob, never a semantics knob.
   */
  def balancedSample(
      df: DataFrame, idCol: String, stratumCol: String, n: Int,
      seed: String = "graft",
      prefilterPct: Option[Int] = None): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(prefilterPct.forall(p => p > 0 && p <= 100),
      s"prefilterPct must be 1..100: $prefilterPct")
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
      .cast("binary"))
    def ranked(in: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))
      in.withColumn("pick_rank", row_number().over(w).cast("long"))
        .filter(col("pick_rank") <= n)
        .drop("__h")
    }
    val withH = df.withColumn("__h", h)
    prefilterPct match {
      case None => ranked(withH)
      case Some(p) =>
        // first 2 hex digits < ceil(256·p/100) ⇔ the hash-order prefix
        val cutoff = math.ceil(256.0 * p / 100).toLong
        val pre = withH.filter(
          conv(substring(col("__h"), 1, 2), 16, 10).cast("long") < cutoff)
        // Null-safe (<=>) joins throughout: a NULL stratum is a
        // stratum like any other (the None path ranks it as one
        // window partition), so the prefilter routing must carry it
        // too — a plain equality join would silently drop every
        // null-stratum row and turn the performance knob into a
        // semantics knob.
        val okStrata = pre.groupBy(col(stratumCol))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= n)
          .select(col(stratumCol).as("__graft_stratum"))
        val shortStrata = df.select(col(stratumCol).as("__graft_stratum"))
          .distinct()
          .join(
            broadcast(okStrata.withColumnRenamed("__graft_stratum", "__graft_ok")),
            col("__graft_stratum") <=> col("__graft_ok"), "left_anti")
        def keep(in: DataFrame, strata: DataFrame): DataFrame =
          in.join(broadcast(strata),
            col(stratumCol) <=> col("__graft_stratum"), "left_semi")
        ranked(keep(pre, okStrata))
          .unionAll(ranked(keep(withH, shortStrata)))
    }
  }

  /**
   * Weighted priority sampling (Ohlsson's sequential Poisson /
   * Duffield–Lund–Thorup priority sampling): keep the k items with the
   * largest priority q_i = w_i / u_i, u_i a per-item uniform — items
   * survive with probability ~proportional to weight, and the sample
   * supports unbiased subset-sum estimation. Two properties make it
   * the 100 TB weighted sample: it is MERGEABLE (top-k of a union =
   * top-k of per-partition top-ks — one `TakeOrderedAndProject`, no
   * global sort of the corpus) and, with the uniform derived from a
   * seeded md5 instead of an RNG, fully REPRODUCIBLE.
   *
   * Integer grid: u16+1 ∈ [1, 65536] is the uniform's numerator and
   * priority = w·65536 div (u16+1) — exact BIGINT, so the selected
   * set is bit-stable under any partitioning and SQL-replayable.
   * Weights must be non-negative integers (token counts, byte sizes).
   */
  def prioritySample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u16 = conv(substring(
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
        .cast("binary")), 1, 4), 16, 10).cast("long")
    df.withColumn("__u", u16 + lit(1L))
      .withColumn("priority",
        expr(s"(cast($weightCol as bigint) * 65536) div __u"))
      .drop("__u")
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /**
   * Horvitz–Thompson subset-sum estimation over a [[prioritySample]]
   * (Duffield–Lund–Thorup 2007) — the card that makes the weighted
   * sample USABLE: the top-k priority sample plus the (k+1)-th
   * priority threshold τ yields the unbiased total estimator
   *
   *   Σ̂ = Σ_{i ∈ sample} max(w_i, τ)
   *
   * so a 50-row sample answers "total tokens in this corpus slice"
   * with provably minimal variance among threshold estimators. All
   * arithmetic rides the same integer priorities as the sample
   * (q = w·65536 div (u16+1), τ in weight units comparable to w), so
   * the estimate is bit-reproducible; when the population has ≤ k
   * rows, τ = 0 and the estimate is exact by construction.
   *
   * Output: one row (k, n_total, true_total, ht_estimate,
   * rel_err_micro) — truth rides along because the card's job is to
   * SHOW the estimator's accuracy on this corpus; at 100 TB you drop
   * the truth column and keep the estimate.
   */
  def priorityEstimate(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u16 = conv(substring(
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
        .cast("binary")), 1, 4), 16, 10).cast("long")
    val pri = df
      .withColumn("__u", u16 + lit(1L))
      .withColumn("__q", expr(s"(cast($weightCol as bigint) * 65536) div __u"))
    val topK1 = pri.orderBy(col("__q").desc, col(idCol)).limit(k + 1)
      .localCheckpoint(true)
    val tau = topK1.agg(count(lit(1)).as("__c"), min("__q").as("__mn"))
      .select(when(col("__c") <= k, lit(0L)).otherwise(col("__mn")).as("__tau"))
    val sample = topK1.orderBy(col("__q").desc, col(idCol)).limit(k)
    val tot = df.agg(sum(col(weightCol).cast("long")).as("true_total"),
      count(lit(1)).as("n_total"))
    sample.crossJoin(broadcast(tau))
      .agg(sum(greatest(col(weightCol).cast("long"), col("__tau")))
        .as("ht_estimate"))
      .crossJoin(broadcast(tot))
      .select(lit(k.toLong).as("k"), col("n_total"), col("true_total"),
        col("ht_estimate"),
        expr("(1000000 * abs(ht_estimate - true_total)) div true_total")
          .as("rel_err_micro"))
  }

  /**
   * Stratified deterministic sampling — the data-mixture knob of a
   * training pipeline (keep 100% of a high-quality source, 10% of a
   * crawl): a row survives iff its id-bucket falls under its stratum's
   * percentage. Same md5 determinism as [[assignSplits]]: the sample
   * is reproducible, incremental, and scan-local; rates ride a
   * broadcast join against the (tiny) rates relation, so changing the
   * mixture never rewrites data.
   *
   * Strata missing from `rates` default to 0% (dropped) — mixtures
   * must be explicit.
   */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100),
      s"rates must be 0..100 percents: $rates")
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF(stratumCol, "__graft_keep_pct")
    df.join(broadcast(ratesDf), Seq(stratumCol), "left")
      .filter(bucket(col(idCol)) <
        coalesce(col("__graft_keep_pct"), lit(0)))
      .drop("__graft_keep_pct")
  }

  /**
   * Near-duplicate split-LEAKAGE card — the check every train/test
   * split needs after dedup found pairs: a near-dup pair straddling
   * train and test means the model is evaluated on (a paraphrase of)
   * its own training data, and the benchmark number is contaminated.
   * Takes any pair relation (MinHash/LSH/SimHash output) and the
   * per-row split assignment; reports pair counts per (split_a,
   * split_b) cell with `leaked` = the pair crosses splits.
   *
   * Shape at 100 TB: the pair relation is already slim (the dedup
   * join's output, not the corpus); two equality joins tag each side
   * with its split, then one tiny hash aggregate — nothing here ever
   * rescans or reshuffles the corpus beyond the id→split projection.
   *
   * Output: (split_a, split_b, n_pairs, leaked), ordered.
   */
  def leakageCard(
      pairs: DataFrame, aCol: String, bCol: String,
      assigned: DataFrame, idCol: String, splitCol: String): DataFrame = {
    val slim = assigned.select(col(idCol), col(splitCol))
    pairs.select(col(aCol), col(bCol))
      .join(slim.withColumnRenamed(idCol, aCol)
        .withColumnRenamed(splitCol, "split_a"), aCol)
      .join(slim.withColumnRenamed(idCol, bCol)
        .withColumnRenamed(splitCol, "split_b"), bCol)
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
      .orderBy("split_a", "split_b")
  }
}
