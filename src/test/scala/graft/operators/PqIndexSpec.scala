package graft.operators

import graft.SparkFunSuite
import graft.functions.{GraftFunctions, VectorKernels}
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  // k=64 (6-bit codebooks): measured recall 1.0 with 100-candidate
  // re-rank on this corpus; k=16 needs 4x the candidates for the same
  // recall. Codes stay m=8 bytes either way.
  private lazy val model = PqIndex.train(emb, "embedding", m = 8, k = 64)
  private lazy val encoded = PqIndex.encode(emb, "embedding", model).cache()

  private def queryVec: Array[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray

  test("codes are m bytes; compression ratio is 4*dim+1 over m") {
    val lens = encoded.select(length(col("codes"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq === Seq(model.m))
    assert(model.compressionRatio === (4.0 * 64 + 1) / 8) // 32.125x
  }

  test("encode is deterministic and matches the interpreted kernel") {
    val row = emb.where(col("vec_id") === 0).select("embedding").head
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      row.getSeq[Float](0).toArray)
    val cb = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(model.codebook)
    val expect = VectorKernels.pqEncode(arr, cb, model.m, model.k)
    val got = encoded.where(col("vec_id") === 0).select("codes").head.getAs[Array[Byte]](0)
    assert(got.toSeq === expect.toSeq)
  }

  test("ADC score equals the sum of per-subspace centroid distances (hand check)") {
    // 1 subspace, 2 centroids at 0 and 10: vector 9 → code 1;
    // query 1 → lut = (1, 81) → ADC = 81
    import spark.implicits._
    val cb = Seq(0.0f, 10.0f)
    val df = Seq((1L, Array(9.0f))).toDF("id", "v")
    GraftFunctions.register(spark)
    val codes = df.select(
      GraftFunctions.pqEncode(col("v"), typedLit(cb), 1, 2).as("codes"))
    val m = PqIndex.PqModel(1, 2, 1, cb.toArray)
    val lut = PqIndex.adcLut(m, Array(1.0f))
    assert(lut.toSeq === Seq(1.0, 81.0))
    val s = codes.select(
      GraftFunctions.pqAdcScore(col("codes"), typedLit(lut.toSeq), 2)).head.getDouble(0)
    assert(s === 81.0)
  }

  test("ADC+rerank recovers the exact top-10 (measured recall on this corpus)") {
    GraftFunctions.register(spark)
    val exact = emb.select(col("vec_id"),
        GraftFunctions.knnEuclideanDistance(col("embedding"), typedLit(queryVec.toSeq))
          .as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    // 50 candidates (10% of corpus): recall >= 0.9; 100: recall 1.0
    val r50 = PqIndex.searchRerank(encoded, "vec_id", "embedding", model,
        queryVec, k = 10, candidates = 50)
      .collect().map(_.getLong(0)).toSet
    assert(r50.intersect(exact).size >= 9, s"recall@50cand ${r50.intersect(exact).size}/10")
    val r100 = PqIndex.searchRerank(encoded, "vec_id", "embedding", model,
        queryVec, k = 10, candidates = 100)
      .collect().map(_.getLong(0)).toSet
    assert(r100 === exact)
    // raw ADC alone is already a decent ranker
    val adcOnly = PqIndex.search(encoded, "vec_id", model, queryVec, 10)
      .collect().map(_.getLong(0)).toSet
    assert(adcOnly.intersect(exact).size >= 5, s"adc-only hit ${adcOnly.intersect(exact).size}")
  }

  test("ADC scan plan touches only the codes column, no cartesian/UDF") {
    val plan = PqIndex.search(encoded.select("vec_id", "codes"), "vec_id",
      model, queryVec, 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
  }

  test("IVF-PQ composition: cluster pruning + ADC + re-rank finds the true neighbors") {
    val (assigned, ivf) = IvfIndex.build(emb, "embedding", numClusters = 8)
    val encodedAssigned = PqIndex.encode(assigned, "embedding", model)
    val exact = {
      GraftFunctions.register(spark)
      emb.select(col("vec_id"),
          GraftFunctions.knnEuclideanDistance(col("embedding"), typedLit(queryVec.toSeq))
            .as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    // full breadth => candidate set equals the ADC path => recall 1
    val full = PqIndex.ivfPqSearch(encodedAssigned, ivf, model, "vec_id", "embedding",
        queryVec, k = 10, searchTopSize = 8, candidates = 100)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)
    // pruned breadth scans fewer rows and still finds most neighbors
    val pruned = PqIndex.ivfPqSearch(encodedAssigned, ivf, model, "vec_id", "embedding",
        queryVec, k = 10, searchTopSize = 4, candidates = 100)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.intersect(exact).size >= 6, s"pruned recall ${pruned.intersect(exact).size}/10")
  }

  test("IVF-PQ randomized churn: append/delete/compact keeps rerank parity, never resurrects tombstones") {
    // The NswAnnSpec churn discipline applied to the composed IVF-PQ
    // shape: base store built and encoded, appends assigned to the
    // FROZEN centroids + encoded with the FROZEN codebook (the
    // production append path — no retrain), tombstones anti-joined
    // before the ADC scan, compaction physically drops dead rows.
    // At full breadth with the shipped candidate budget the exact
    // re-rank must equal brute force over the live rows at every
    // step, and a deleted id must never reappear — before OR after
    // its compaction.
    GraftFunctions.register(spark)
    val allIds = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    def df(ids: Set[Long]) =
      emb.where(col("vec_id").isInCollection(ids.map(Long.box)))
    def qvOf(id: Long): Array[Float] =
      emb.where(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(allIds.toVector)
      val baseCut = (shuffled.size * (0.6 + 0.2 * rnd.nextDouble())).toInt
      var present = shuffled.take(baseCut).toSet
      var pool = shuffled.drop(baseCut)
      val (assignedBase, ivf) = IvfIndex.build(df(present), "embedding",
        numClusters = 8)
      var store = PqIndex.encode(assignedBase, "embedding", model)
        .localCheckpoint(true)
      var dead = Set.empty[Long]
      var deletedEver = Set.empty[Long]
      def check(label: String): Unit = {
        val liveIds = present -- dead
        val qid = liveIds.toSeq.sorted.apply(rnd.nextInt(liveIds.size))
        val q = qvOf(qid)
        val got = PqIndex.ivfPqSearchWithTombstones(store, ivf, model,
          "vec_id", "embedding", q, k = 10, searchTopSize = 8,
          candidates = 128,
          tombstones = df(dead).select("vec_id"), scoreScale = Some(6))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val want = df(liveIds).select(col("vec_id"),
            round(GraftFunctions.knnEuclideanDistance(col("embedding"),
              typedLit(q.toSeq)), 6).as("d"))
          .orderBy(col("d"), col("vec_id")).limit(10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got === want, s"seed $seed $label query $qid")
        assert(got.forall(t => !deletedEver(t._1)),
          s"seed $seed $label: resurrected tombstoned id")
      }
      check("base")
      for (op <- 1 to 3) {
        val r = rnd.nextInt(3)
        if (r == 0 && pool.nonEmpty) { // append with frozen centroids/codebook
          val take = math.min(pool.size, 20 + rnd.nextInt(60))
          val batch = pool.take(take).toSet
          pool = pool.drop(take)
          store = store.unionByName(PqIndex.encode(
            IvfIndex.assignBatch(df(batch), "embedding", ivf),
            "embedding", model)).localCheckpoint(true)
          present ++= batch
        } else if (r == 1) { // tombstone ~1/8 of the live rows
          val live = (present -- dead).toVector.sorted
          val kill = rnd.shuffle(live).take(math.max(1, live.size / 8)).toSet
          dead ++= kill
          deletedEver ++= kill
        } else if (dead.nonEmpty) { // compact: physically drop dead rows
          store = store.join(
              broadcast(df(dead).select("vec_id")), Seq("vec_id"), "left_anti")
            .localCheckpoint(true)
          present --= dead
          dead = Set.empty
        }
        check(s"op $op")
      }
    }
  }

  test("pq expressions: null on dimension mismatch or malformed inputs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // vector dim not divisible by m -> null
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
      .select(GraftFunctions.pqEncode(col("v"), typedLit(model.codebook.toSeq), 8, 64))
      .head
    assert(bad.isNullAt(0))
    // wrong-size lut -> null score
    val codes = Seq((1L, Array[Byte](0, 1))).toDF("id", "codes")
      .select(GraftFunctions.pqAdcScore(col("codes"), typedLit(Seq(1.0, 2.0, 3.0)), 4))
      .head
    assert(codes.isNullAt(0))
  }
}
