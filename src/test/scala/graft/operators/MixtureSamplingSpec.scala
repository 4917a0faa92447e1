package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MixtureSamplingSpec extends SparkFunSuite {

  // srcA: docs 1, 6, 9 × 4 tokens (T=12); srcB: docs 11, 19 × 2 tokens
  // (T=4). Buckets (first 6 md5 hex digits / 2^24): 1→0.7687,
  // 6→0.0878, 9→0.2725, 11→0.3948, 19→0.1213.
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "srcA", "a b c d"), (6L, "srcA", "a b c d"), (9L, "srcA", "a b c d"),
      (11L, "srcB", "a b"), (19L, "srcB", "a b")
    ).toDF("doc_id", "source", "text")
  }
  private def nTokens = size(split(col("text"), " ")).cast("long")

  test("mixtureReport: hand-computed sqrt-temperature recipe at tau=0.5") {
    // z = sqrt(12) + sqrt(4) = 5.464102; w_A = 0.634, w_B = 0.366;
    // floor(16 * 0.5) = 8 → budgets floor(8*.634)=5, floor(8*.366)=2.
    // Keep: srcA iff bucket < 5/12 (docs 6, 9); srcB iff bucket < 2/4
    // (docs 11, 19).
    val r = MixtureSampling.mixtureReport(docs, "doc_id", "source", nTokens,
      tau = 0.5).orderBy("source").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("srcA", "srcB"))
    assert(r.map(_.getLong(1)).toSeq === Seq(12L, 4L))      // t_tokens
    assert(r.map(_.getDouble(2)).toSeq === Seq(0.634, 0.366)) // weight
    assert(r.map(_.getLong(3)).toSeq === Seq(5L, 2L))       // token_budget
    assert(r.map(_.getLong(4)).toSeq === Seq(2L, 2L))       // n_kept
    assert(r.map(_.getLong(5)).toSeq === Seq(8L, 4L))       // kept_tokens
  }

  test("sampleByPlan: exact kept-id set, deterministic across reruns") {
    val plan = MixtureSampling.mixturePlan(
      docs.select(col("source"), col("doc_id"), nTokens.as("t")),
      "source", col("t"), tau = 0.5)
    val kept = MixtureSampling.sampleByPlan(docs, "doc_id", "source", plan)
      .select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(kept === Seq(6L, 9L, 11L, 19L))
    val again = MixtureSampling.sampleByPlan(docs, "doc_id", "source", plan)
      .select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(again === kept)
  }

  test("tau=1 single source keeps everything (budget >= mass)") {
    val one = docs.filter(col("source") === "srcA")
    val r = MixtureSampling.mixtureReport(one, "doc_id", "source", nTokens,
      tau = 1.0).collect()
    assert(r.length === 1)
    assert(r(0).getDouble(2) === 1.0)   // weight
    assert(r(0).getLong(3) === 12L)     // budget = full mass
    assert(r(0).getLong(4) === 3L)      // every doc kept
  }

  test("upsampleEpochs: floor copies for all, fraction by bucket, unlisted drop") {
    import spark.implicits._
    // Buckets: 1→0.7687, 6→0.0878, 9→0.2725, 11→0.3948, 19→0.1213.
    val rows = Seq(
      (1L, "srcA"), (6L, "srcA"), (9L, "srcA"),  // 1.5 epochs: frac iff bucket < .5
      (11L, "srcB"), (19L, "srcB"),              // 0.3 epochs: iff bucket < .3
      (40L, "srcC")                              // unlisted → dropped
    ).toDF("doc_id", "source")
    val got = MixtureSampling.upsampleEpochs(rows, "doc_id", "source",
      Map("srcA" -> 1.5, "srcB" -> 0.3))
      .select("doc_id", "epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq(
      (1L, 0L),                       // bucket .7687 ≥ .5 → 1 copy
      (6L, 0L), (6L, 1L),             // .0878 < .5 → 2 copies
      (9L, 0L), (9L, 1L),             // .2725 < .5 → 2 copies
      (19L, 0L)))                     // .1213 < .3; 11 (.3948) drops
  }

  test("corpus never shuffles: the sample filter is scan-local") {
    val plan = MixtureSampling.mixturePlan(
      docs.select(col("source"), col("doc_id"), nTokens.as("t")),
      "source", col("t"), tau = 0.5)
    val explained = MixtureSampling
      .sampleByPlan(docs, "doc_id", "source", plan)
      .queryExecution.executedPlan.toString
    // The only joins are broadcasts of the tiny plan relation — no
    // sort-merge join, no exchange keyed on the corpus side.
    assert(explained.contains("BroadcastHashJoin"))
    assert(!explained.contains("SortMergeJoin"))
  }

  test("randomized invariants: subset/determinism, full-keep, zero-keep, copy bounds") {
    import spark.implicits._
    for (seed <- Seq(7L, 21L, 99L)) {
      val rnd = new scala.util.Random(seed)
      val sources = Seq("a", "b", "c")
      val corpus = (0 until 120).map { i =>
        (rnd.nextLong().abs % 100000L + i.toLong * 100000L,
          sources(rnd.nextInt(sources.length)),
          (1 to (1 + rnd.nextInt(30))).map(_ => "t").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val nTok = size(split(col("text"), " ")).cast("long")
      val withTok = corpus.select(col("source"), col("doc_id"), nTok.as("t"))

      // mixture plan totals account for every corpus token
      val plan = MixtureSampling.mixturePlan(withTok, "source", col("t"), tau = 0.6)
      val planRows = plan.collect()
      assert(planRows.map(_.getLong(1)).sum ===
        withTok.agg(sum("t")).head.getLong(0), s"seed=$seed token mass")

      // sample ⊆ corpus and deterministic
      val ids = MixtureSampling.sampleByPlan(corpus, "doc_id", "source", plan)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val all = corpus.select("doc_id").as[Long].collect().toSet
      assert(ids.forall(all), s"seed=$seed subset")
      val ids2 = MixtureSampling.sampleByPlan(
        corpus.repartition(5), "doc_id", "source", plan)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids2 === ids, s"seed=$seed determinism")

      // tau=1 keeps ~everything — the 4-decimal weight rounding can
      // shave budget_s just under T_s, dropping the top bucket sliver
      // (documented trade; single-source keeps exactly all, pinned
      // above) — and a zero-budget plan keeps none
      val keepAll = MixtureSampling.sampleByPlan(corpus, "doc_id", "source",
        MixtureSampling.mixturePlan(withTok, "source", col("t"), tau = 1.0))
        .count()
      assert(keepAll >= (corpus.count() * 95) / 100 && keepAll <= corpus.count(),
        s"seed=$seed tau=1 kept $keepAll of ${corpus.count()}")
      val zero = plan.withColumn("token_budget", lit(0L))
      assert(MixtureSampling.sampleByPlan(corpus, "doc_id", "source", zero)
        .isEmpty, s"seed=$seed zero budget")

      // epoch copies per doc ∈ {floor(e), floor(e)+1}, labeled 0..c-1
      val eps = Map("a" -> 2.3, "b" -> 0.7, "c" -> 1.0)
      val up = MixtureSampling.upsampleEpochs(corpus, "doc_id", "source", eps)
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("c"), max("epoch").as("mx"), min("epoch").as("mn"))
        .collect()
      up.foreach { r =>
        val e = eps(r.getString(1))
        val c = r.getLong(2)
        assert(c == math.floor(e).toLong || c == math.floor(e).toLong + 1,
          s"seed=$seed copies=$c for e=$e")
        assert(r.getLong(4) === 0L && r.getLong(3) === c - 1,
          s"seed=$seed epoch labels")
      }

      // balanced pick: exactly min(n, stratum size) rows, contiguous ranks
      val picked = DatasetSplit.balancedSample(corpus, "doc_id", "source", n = 15)
        .groupBy("source")
        .agg(count(lit(1)).as("c"), max("pick_rank").as("mx"))
        .collect()
      val bySrc = corpus.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      picked.foreach { r =>
        val expect = math.min(15L, bySrc(r.getString(0)))
        assert(r.getLong(1) === expect && r.getLong(2) === expect,
          s"seed=$seed stratum ${r.getString(0)}")
      }
    }
  }

  test("upsampleEpochs introduces no exchange: fan-out stays in the scan stage") {
    val explained = MixtureSampling.upsampleEpochs(docs, "doc_id", "source",
      Map("srcA" -> 1.5, "srcB" -> 0.3))
      .queryExecution.executedPlan.toString
    // Factors broadcast; copies generate+explode in place. The only
    // exchange allowed is the broadcast of the tiny factor relation.
    assert(explained.contains("BroadcastHashJoin"))
    assert(!explained.contains("ShuffleExchange"),
      s"unexpected shuffle in:\n$explained")
  }

  test("sampleByPlan verdict is exact past Long-overflow token masses (>2^39)") {
    import spark.implicits._
    // The per-source stats on the plan relation drive the verdict, so a
    // hand-set mass of 2^45 tokens exercises the 100-TB regime without
    // 100 TB of rows. The old row-level verdict `bucket24·T < B·2^24`
    // wrapped its Long multiply at T > 2^39 and flipped verdicts; the
    // cutoff form must match unbounded-integer arithmetic exactly.
    val docs = (1L to 1000L).toDF("doc_id").withColumn("source", lit("big"))
    val t = 1L << 45
    val budget = 3L * (1L << 42) // 3/8 of the mass
    val plan = Seq(("big", t, 0.375, budget))
      .toDF("source", "t_tokens", "weight", "token_budget")
    val kept = MixtureSampling.sampleByPlan(docs, "doc_id", "source", plan)
      .select("doc_id").as[Long].collect().toSet
    val expect = docs
      .select(col("doc_id"), MixtureSampling.bucket24(col("doc_id")).as("b"))
      .collect()
      .collect { case r if BigInt(r.getLong(1)) * BigInt(t) <
          BigInt(budget) * BigInt(1L << 24) => r.getLong(0) }
      .toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < 1000) // the cut actually bites
  }

  test("sampleByPlan: budget >= mass keeps every row at overflow-scale masses") {
    import spark.implicits._
    val docs = (1L to 100L).toDF("doc_id").withColumn("source", lit("big"))
    val plan = Seq(("big", 1L << 45, 1.0, 1L << 45))
      .toDF("source", "t_tokens", "weight", "token_budget")
    assert(MixtureSampling.sampleByPlan(docs, "doc_id", "source", plan)
      .count() === 100L)
  }

  test("sampleByPlan: a zero-token source never divides by zero (ANSI-safe)") {
    import spark.implicits._
    val docs = (1L to 10L).toDF("doc_id").withColumn("source", lit("empty"))
    // engine-made plans give zero-mass sources zero budget → drop all
    val dropAll = Seq(("empty", 0L, 0.0, 0L))
      .toDF("source", "t_tokens", "weight", "token_budget")
    assert(MixtureSampling.sampleByPlan(docs, "doc_id", "source", dropAll)
      .count() === 0L)
    // hand-made plan with positive budget: 0·bucket < B·2^24 keeps all
    val keepAll = Seq(("empty", 0L, 1.0, 5L))
      .toDF("source", "t_tokens", "weight", "token_budget")
    assert(MixtureSampling.sampleByPlan(docs, "doc_id", "source", keepAll)
      .count() === 10L)
  }

  test("neymanAllocation: budget flows to the high-variance stratum") {
    import spark.implicits._
    // A: 100 rows of constant 50 (variance 0); B: 100 rows alternating
    // 0/100 (max variance at this mean)
    val rows = (1 to 100).map(i => ("A", 50L)) ++
      (1 to 100).map(i => ("B", if (i % 2 == 0) 0L else 100L))
    val r = MixtureSampling.neymanAllocation(
      rows.toDF("g", "v"), "g", "v", n = 20)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("A")._2 === 0L)  // sigma weight 0
    assert(r("A")._3 === 0L)  // no budget to a zero-variance stratum
    assert(r("B")._3 === 20L) // all of it to B
    // weight identity: N*sum(v^2) - (sum v)^2 = 100*500000 - 5000^2
    val want = math.sqrt(100.0 * 500000 - 5000.0 * 5000).toLong
    assert(r("B")._2 === want)
  }

  test("neymanAllocation: all-constant strata fall back to proportional") {
    import spark.implicits._
    val rows = (1 to 30).map(_ => ("A", 7L)) ++ (1 to 90).map(_ => ("B", 9L))
    val r = MixtureSampling.neymanAllocation(
      rows.toDF("g", "v"), "g", "v", n = 12)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("A") === 3L && r("B") === 9L)
  }

  test("neymanAllocation: allocations sum to n; deterministic") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 5}", (i * 17 % 23).toLong))
    val df = rows.toDF("g", "v")
    val a = MixtureSampling.neymanAllocation(df.repartition(1), "g", "v", 37)
      .orderBy("stratum").collect().toSeq
    val b = MixtureSampling.neymanAllocation(df.repartition(9), "g", "v", 37)
      .orderBy("stratum").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(3)).sum === 37L)
  }

  test("temperatureApportion: budget exact, small strata up-sampled") {
    import spark.implicits._
    // 900 docs in "big", 100 in "small": raw share 90/10; at alpha=0.3
    // the small stratum's share must strictly exceed 10%
    val df = ((1 to 900).map(i => ("big", i)) ++
      (1 to 100).map(i => ("small", i))).toDF("g", "i")
    val rows = MixtureSampling.temperatureApportion(df, "g", 100, 3, 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.values.sum === 100L)
    assert(rows("small") > 10L, rows.toString)
    assert(rows("big") + rows("small") === 100L)
  }

  test("temperatureApportion: alpha = 1 reduces to count apportionment") {
    import spark.implicits._
    val df = ((1 to 60).map(i => ("a", i)) ++ (1 to 30).map(i => ("b", i)) ++
      (1 to 10).map(i => ("c", i))).toDF("g", "i")
    val temp = MixtureSampling.temperatureApportion(df, "g", 50, 1, 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val plain = MixtureSampling.apportion(df, "g", 50)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(temp === plain)
  }

  test("temperatureApportion: validation and determinism") {
    import spark.implicits._
    val df = (1 to 40).map(i => (s"g${i % 4}", i)).toDF("g", "i")
    intercept[IllegalArgumentException] {
      MixtureSampling.temperatureApportion(df, "g", 10, 11, 10)
    }
    val a = MixtureSampling.temperatureApportion(df.repartition(1), "g", 10, 3, 10)
      .collect().toSeq
    val b = MixtureSampling.temperatureApportion(df.repartition(7), "g", 10, 3, 10)
      .collect().toSeq
    assert(a === b)
  }
}
