package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("blockedCosinePairs: only within-block pairs, threshold respected, a_id < b_id") {
    val pairs = SimilarityJoin.blockedCosinePairs(emb, "vec_id", "embedding",
      "label", threshold = 0.3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.3))
    // labels must match — join back to verify
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pairs.forall(r => labels(r.getLong(0)) == labels(r.getLong(1))))
  }

  test("lshCosinePairs: subset of the exact same-bucket semantics; high precision") {
    val got = SimilarityJoin.lshCosinePairs(emb, "vec_id", "embedding",
      dim = 64, nPlanes = 10, threshold = 0.3).collect()
    // verified pairs carry exact cosine ≥ threshold by construction
    assert(got.forall(_.getDouble(2) >= 0.3))
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("lsh recall grows as planes shrink (coarser buckets)") {
    def count(nPlanes: Int) = SimilarityJoin.lshCosinePairs(
      emb, "vec_id", "embedding", dim = 64, nPlanes = nPlanes,
      threshold = 0.3).count()
    assert(count(4) >= count(12))
  }

  test("maxBucket drops oversized label blocks") {
    val uncapped = SimilarityJoin.blockedCosinePairs(
      emb, "vec_id", "embedding", "label", threshold = -1.0).count()
    val capped = SimilarityJoin.blockedCosinePairs(
      emb, "vec_id", "embedding", "label", threshold = -1.0,
      maxBucket = Some(1)).count()
    assert(uncapped > 0L)
    assert(capped === 0L) // every label block has > 1 row ⇒ all dropped
  }

  test("maxBucket bounds a viral label block without touching organic pairs") {
    // The coarse-key hazard the driver entries guard against: `label`
    // cardinality doesn't grow with the corpus, so one label can go
    // viral (here: 500 copies of vec 0 under a fresh label 9999) and
    // the within-block join is quadratic in its size.
    val viral = emb.where(col("vec_id") === 0)
      .select(explode(expr("sequence(10000L, 10499L)")).as("vec_id"),
        col("embedding"), lit(9999).as("label"))
    val corpus = emb.select("vec_id", "embedding", "label").union(viral)
    def run(df: org.apache.spark.sql.DataFrame, cap: Option[Int]) =
      SimilarityJoin.blockedCosinePairs(df, "vec_id", "embedding", "label",
        threshold = 0.3, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(corpus, None)
    assert(uncapped.size >= 500 * 499 / 2) // quadratic blowup is real
    // Cap above every organic label block but below the viral one: the
    // viral block is dropped wholesale before the self-join, organic
    // pairs are byte-identical to the no-viral baseline.
    val capped = run(corpus, Some(200))
    assert(capped.forall { case (a, b) => a < 10000 && b < 10000 })
    assert(capped === run(emb, None))
  }

  test("no cartesian product in either plan") {
    Seq(
      SimilarityJoin.blockedCosinePairs(emb, "vec_id", "embedding", "label", 0.3),
      SimilarityJoin.lshCosinePairs(emb, "vec_id", "embedding", 64),
      SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
        bitsPerTable = 4, nTables = 8, threshold = 0.4)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  /** Exact all-pairs threshold join computed with the engine's own
    * cosine expression — the banded LSH's ground truth. */
  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        GraftFunctions.knnCosineSimilarity(col("a.v"), col("b.v")).as("cs"))
      .filter(col("cs") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("lshCosinePairsBanded: recall 1 vs exact join at the driver configs") {
    // both the exhaustive (4, 64) point and the measured-cheapest
    // recall-1 point (6, 64) — the driver query's configuration
    val exact = exactPairs(0.4)
    Seq((4, 64), (6, 64)).foreach { case (bits, tables) =>
      val got = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
        bitsPerTable = bits, nTables = tables, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === exact, s"bits=$bits tables=$tables")
    }
  }

  test("knnGraph: hand-computed ranks on a 4-vector fixture; k bounds degree") {
    import spark.implicits._
    // Unit-normalized cosines: (1,2) = 1/√2 ≈ .7071, (1,3) = 3/√10 ≈
    // .9487, (2,3) = 4/√20 ≈ .8944; v4 orthogonal to all → isolated.
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(1f, 1f, 0f)),
      (3L, Seq(3f, 1f, 0f)),
      (4L, Seq(0f, 0f, 1f))).toDF("id", "v")
    val g = SimilarityJoin.knnGraph(vecs, "id", "v", k = 2,
      bitsPerTable = 2, nTables = 32, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(g === Set(
      (1L, 3L, 1L), (1L, 2L, 2L),   // 1: .9487 to 3 beats .7071 to 2
      (2L, 3L, 1L), (2L, 1L, 2L),   // 2: .8944 to 3 beats .7071 to 1
      (3L, 1L, 1L), (3L, 2L, 2L)))  // 3: .9487 to 1 beats .8944 to 2
    val k1 = SimilarityJoin.knnGraph(vecs, "id", "v", k = 1,
      bitsPerTable = 2, nTables = 32, threshold = 0.4)
    assert(k1.groupBy("id").count().filter(col("count") > 1).isEmpty)
  }

  test("knnBetween: per-query ranks on a fixture; corpus never pairs with itself") {
    import spark.implicits._
    // Query q against corpus c1≈q (cos .9487), c2 (cos .7071), c3 ⊥ q.
    val qs = Seq((100L, Seq(1f, 0f, 0f))).toDF("id", "v")
    val cs = Seq(
      (1L, Seq(3f, 1f, 0f)), (2L, Seq(1f, 1f, 0f)), (3L, Seq(0f, 0f, 1f)))
      .toDF("id", "v")
    val got = SimilarityJoin.knnBetween(qs, cs, "id", "v", k = 2,
      bitsPerTable = 2, nTables = 32, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got === Set((100L, 1L, 1L), (100L, 2L, 2L)))
    val k1 = SimilarityJoin.knnBetween(qs, cs, "id", "v", k = 1,
      bitsPerTable = 2, nTables = 32, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1 === Set((100L, 1L)))
  }

  test("lshCosinePairsBetween: recall 1 vs the exact cross-relation join at the driver config") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val corpus = emb.filter(col("vec_id") < 250)
    val batch = emb.filter(col("vec_id") >= 250)
    val exact = batch.select(col("vec_id").as("bid"), col("embedding").as("bv"))
      .join(corpus.select(col("vec_id").as("cid"), col("embedding").as("cv")),
        GraftFunctions.knnCosineSimilarity(col("bv"), col("cv")) >= 0.4)
      .select("bid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SimilarityJoin.lshCosinePairsBetween(batch, corpus, "vec_id", "embedding",
        bitsPerTable = 6, nTables = 64, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
    assert(exact.nonEmpty) // the fixture actually exercises matches
  }

  test("incrementalSemanticNew: planted near-dup is gated, novel rows survive") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f))).toDF("id", "v")
    val batch = Seq(
      (10L, Seq(0.99f, 0.1f, 0f)), // near-dup of corpus 1 → gated
      (11L, Seq(0f, 0f, 1f)))      // orthogonal to everything → survives
      .toDF("id", "v")
    val got = Dedup.incrementalSemanticNew(batch, corpus, "id", "v",
        bitsPerTable = 2, nTables = 32, threshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(got === Set(11L))
  }

  test("lshCosinePairsBanded: recall grows with table count, candidates shrink with bits") {
    def recall(bits: Int, tables: Int): Double = {
      val exact = exactPairs(0.4)
      val got = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
        bitsPerTable = bits, nTables = tables, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    assert(recall(4, 64) >= recall(4, 4))
    // precision of the candidate stage: more bits ⇒ finer buckets. The
    // output is verified either way, so just pin the monotone recall.
    assert(recall(8, 16) <= recall(2, 16) + 1e-9)
  }

  test("lshCosinePairsBanded: carryVectors layout ≡ slim layout, rows and scores") {
    def run(carry: Boolean) = SimilarityJoin.lshCosinePairsBanded(
      emb, "vec_id", "embedding",
      bitsPerTable = 6, nTables = 64, threshold = 0.4, carryVectors = carry)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(true) === run(false))
  }

  test("maxBucket bounds a viral duplicate cluster without touching other pairs") {
    // 500 verbatim copies of vec_id 0's embedding — the boilerplate-page
    // hazard. Identical vectors share identical buckets in EVERY table,
    // so uncapped LSH turns the cluster into ≥ 500·499/2 quadratic pairs.
    val viral = emb.where(col("vec_id") === 0)
      .select(explode(expr("sequence(10000L, 10499L)")).as("vec_id"),
        col("embedding"), col("label"))
    val corpus = emb.select("vec_id", "embedding", "label").union(viral)
    def run(df: org.apache.spark.sql.DataFrame, cap: Option[Int]) =
      SimilarityJoin.lshCosinePairsBanded(df, "vec_id", "embedding",
        bitsPerTable = 6, nTables = 64, threshold = 0.4, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(corpus, None)
    assert(uncapped.size >= 500 * 499 / 2) // the quadratic blowup is real
    // Cap above every organic bucket (probe-measured max 24 at this sf)
    // but below the viral cluster: every bucket holding the cluster is
    // dropped wholesale before the self-join.
    val capped = run(corpus, Some(200))
    assert(capped.forall { case (a, b) => a < 10000 && b < 10000 })
    // Non-viral pairs are untouched EXCEPT those involving vec 0 itself,
    // whose every bucket is (correctly) viral — byte-identical copies are
    // exact-dedup territory, not near-dup pairing work.
    val basePairs = run(emb, None)
    assert(capped === basePairs.filter { case (a, b) => a != 0L && b != 0L })
  }

  test("auto layout: broadcast-able vectors pick slim, oversized pick carry, same rows") {
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(conf)
    try {
      // 500 × 64-float rows estimate ~150 KB — well under the default
      // 10 MB threshold ⇒ slim (join-backs broadcast).
      spark.conf.set(conf, 10 * 1024 * 1024)
      assert(!SimilarityJoin.chooseCarryVectors(emb, "vec_id", "embedding"))
      val slim = SimilarityJoin.lshCosinePairsBandedAuto(emb, "vec_id", "embedding",
        bitsPerTable = 6, nTables = 64, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // Starve the threshold ⇒ the vector relation can no longer
      // broadcast ⇒ carry vectors through the bucket join.
      spark.conf.set(conf, 1024)
      assert(SimilarityJoin.chooseCarryVectors(emb, "vec_id", "embedding"))
      val carry = SimilarityJoin.lshCosinePairsBandedAuto(emb, "vec_id", "embedding",
        bitsPerTable = 6, nTables = 64, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(slim === carry)
      assert(slim.nonEmpty)
    } finally spark.conf.set(conf, saved)
  }

  test("the maxBucket guardrail plans as a broadcast anti join, not a window sort") {
    val capped = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
      bitsPerTable = 6, nTables = 64, threshold = 0.4, maxBucket = Some(1024))
    val plan = capped.queryExecution.executedPlan.toString
    // oversized keys broadcast into a LeftAnti probe on the keyed rows
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(2000))
    // the guardrail must NOT sort the keyed relation (the window-count
    // formulation's hidden cost at scale)
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("lshCosinePairsBanded is deterministic across runs and repartitionings") {
    def run(parts: Int) = SimilarityJoin.lshCosinePairsBanded(
      emb.repartition(parts), "vec_id", "embedding",
      bitsPerTable = 4, nTables = 16, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(2) === run(7))
  }

  test("cosine_lsh_keys: eval and codegen agree; nulls propagate") {
    import graft.functions.{GraftFunctions, VectorKernels}
    GraftFunctions.register(spark)
    val keyed = emb.select(col("vec_id"),
      GraftFunctions.cosineLshKeys(col("embedding"), 4, 8, 42L).as("keys"))
      .collect()
    assert(keyed.forall(_.getSeq[Long](1).length === 8))
    // interpreted kernel ground truth for one row
    val row = emb.where(col("vec_id") === 0).select("embedding").head
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      row.getSeq[Float](0).toArray)
    val expect = VectorKernels.cosineLshKeys(arr, 4, 8, 42L).toLongArray()
    val got = keyed.find(_.getLong(0) == 0L).get.getSeq[Long](1).toArray
    assert(got === expect)
    // table ids folded into keys: table t keys lie in [t<<4, (t+1)<<4)
    assert(got.zipWithIndex.forall { case (k, t) => (k >> 4) === t.toLong })
  }

  test("mutualKnn keeps exactly the reciprocal pairs of the kNN graph") {
    import spark.implicits._
    // hand graph: 1↔2 mutual (ranks 1/1), 1→3 one-directional (3's
    // top-k points elsewhere), 4↔5 mutual with asymmetric ranks.
    val g = Seq(
      (1L, 2L, 0.9, 1L), (2L, 1L, 0.9, 1L),
      (1L, 3L, 0.8, 2L), (3L, 9L, 0.7, 1L),
      (4L, 5L, 0.6, 2L), (5L, 4L, 0.6, 1L), (9L, 3L, 0.7, 1L))
      .toDF("id", "nbr_id", "cos_sim", "nbr_rank")
    val got = SimilarityJoin.mutualKnn(g).orderBy("a_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, 2L, 0.9, 1L, 1L),
      (3L, 9L, 0.7, 1L, 1L),
      (4L, 5L, 0.6, 2L, 1L)))
  }

  test("mutualKnn over the real graph: every pair is reciprocal, none dropped") {
    val graph = SimilarityJoin.knnGraph(emb, "vec_id", "embedding", k = 3,
      bitsPerTable = 6, nTables = 64, threshold = 0.4, maxBucket = Some(1024))
    val mutual = SimilarityJoin.mutualKnn(graph).collect()
    val edges = graph.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: both directions present in the graph
    assert(mutual.forall(r =>
      edges((r.getLong(0), r.getLong(1))) && edges((r.getLong(1), r.getLong(0)))))
    // completeness: every reciprocal graph pair appears exactly once
    val want = edges.filter { case (a, b) => a < b && edges((b, a)) }
    assert(mutual.map(r => (r.getLong(0), r.getLong(1))).toSet === want)
    assert(mutual.length === want.size)
  }
}
