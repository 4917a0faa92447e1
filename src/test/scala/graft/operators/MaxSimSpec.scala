package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/**
 * Late-interaction (ColBERT-style) maxsim retrieval: exact path ≡ a
 * direct in-memory replay of the score matrix, the LSH-candidate
 * path's recall-vs-exact grid (monotone in the candidate budget,
 * recall 1 at the shipped point), determinism, and validation.
 */
class MaxSimSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  /** Driver-row fixture: 8 token vectors per doc, 4 queries × 4
    * token vectors (vec_id < 16, qid = vec_id % 4). */
  private lazy val dt = emb.select(expr("vec_id div 8").as("doc_id"),
    col("vec_id").as("dtok"), col("embedding"))
  private lazy val qt = emb.filter(col("vec_id") < 16)
    .select((col("vec_id") % 4).as("qid"), col("vec_id").as("qtok"),
      col("embedding"))

  private def exactTop(k: Int): Map[Long, Seq[(Long, Long)]] =
    Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id", "embedding", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._3)(Ordering[Long].reverse)
        .map(t => (t._2, t._3)).toSeq }

  test("exact maxsim ≡ direct in-memory replay of the score matrix") {
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val docs = rows.groupBy(_._1 / 8).map { case (d, vs) => d -> vs.map(_._2) }
    val queries = rows.filter(_._1 < 16)
      .groupBy(_._1 % 4).map { case (q, ts) => q -> ts.map(_._2) }
    def micro(a: Array[Float], b: Array[Float]): Long =
      math.rint(Retrieval.cosRound6(a, b) * 1e6).toLong
    val want = queries.map { case (q, toks) =>
      val perDoc = docs.map { case (d, dvs) =>
        d -> toks.map(t => dvs.map(dv => micro(t, dv)).max).sum
      }
      q -> perDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(5)
    }
    val got = exactTop(5)
    assert(got.keySet === want.keySet)
    want.foreach { case (q, top) =>
      assert(got(q) === top, s"query $q")
    }
  }

  test("LSH candidate path: recall grid is monotone, full at the shipped budget") {
    val exact = exactTop(5).map { case (q, t) => q -> t.map(_._1).toSet }
    // grid measured on this corpus (75 docs × 8 tokens): budget 1 →
    // only each token's single best token-match scores; 32 → 17/20
    // (a doc whose best match ranks past the per-token cap drops);
    // 128 → full agreement with the exact matrix
    val recalls = Seq(1, 4, 32, 128).map { c =>
      val got = Retrieval.maxSimTopKLsh(qt, "qid", "qtok",
        dt, "doc_id", "dtok", "embedding", k = 5, candidatesPerToken = c)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size
      }.sum
    }
    assert(recalls === recalls.sorted, s"recall grid $recalls not monotone")
    assert(recalls.last === 20, s"shipped budget recall ${recalls.last}/20")
  }

  test("plan shape: broadcast nested loop + hash aggregates, no window sort") {
    // the exact path's contract: ONE broadcast of the bounded
    // query-token relation (a BroadcastNestedLoopJoin, deliberate),
    // the score matrix collapsed by hash aggregation (the k-slot
    // TypedImperativeAggregate plans as ObjectHashAggregate), and no
    // Window — a row_number() formulation would sort every candidate
    val plan = Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id",
      "embedding", 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "query tokens must broadcast")
    assert(plan.contains("ObjectHashAggregate"),
      "top-k must be the k-slot aggregate")
    assert(!plan.contains("Window"), "maxsim must not window-sort")
  }

  private lazy val ivfStore: (String, IvfIndex.IvfModel) = {
    val (a, m) = IvfIndex.build(dt, "embedding", numClusters = 8)
    val p = java.nio.file.Files.createTempDirectory("maxsim_ivf_spec").toString
    IvfIndex.writePartitioned(a, p)
    (p, m)
  }

  test("IVF at-rest path: full breadth ≡ exact maxsim bit-for-bit") {
    val (path, model) = ivfStore
    val got = Retrieval.maxSimTopKIndexed(qt, "qid", "qtok",
      spark.read.parquet(path), model, "doc_id", "embedding",
      k = 5, searchTopSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val want = Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id",
      "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq === want.toSeq)
  }

  test("IVF at-rest path: doc-recall grid is monotone in searchTopSize") {
    val (path, model) = ivfStore
    val store = spark.read.parquet(path)
    val exact = exactTop(5).map { case (q, t) => q -> t.map(_._1).toSet }
    val recalls = Seq(1, 2, 4, 8).map { breadth =>
      val got = Retrieval.maxSimTopKIndexed(qt, "qid", "qtok", store,
        model, "doc_id", "embedding", k = 5, searchTopSize = breadth)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size
      }.sum
    }
    assert(recalls === recalls.sorted, s"recall grid $recalls not monotone")
    assert(recalls.last === 20, s"full-breadth recall ${recalls.last}/20")
  }

  test("IVF at-rest path: pruned breadth scans only probed partitions") {
    val (path, model) = ivfStore
    val store = spark.read.parquet(path)
    val plan = Retrieval.maxSimTopKIndexed(qt, "qid", "qtok", store,
      model, "doc_id", "embedding", k = 5, searchTopSize = 1)
      .queryExecution.executedPlan.toString
    // the probe filter lands on the PARTITION column, so pruning is
    // file-listing-time; the union of 16 tokens' single best clusters
    // must be a strict subset of the 8 partitions on this fixture
    val probed = qt.select("embedding").collect()
      .map(r => model.rankClusters(r.getSeq[Float](0).toArray,
        SearchStrategy.CosineSimilarity).head).distinct
    assert(probed.length < 8, "fixture routes all tokens everywhere — widen it")
    assert(plan.contains(IvfIndex.ClusterCol), "probe filter must hit cluster_id")
  }

  test("deterministic: two runs, identical rows") {
    val a = Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id",
      "embedding", 5).collect().map(_.toSeq).toSeq
    val b = Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id",
      "embedding", 5).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("validation: k and candidate budget must be positive") {
    intercept[IllegalArgumentException] {
      Retrieval.maxSimTopK(qt, "qid", "qtok", dt, "doc_id", "embedding", 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.maxSimTopKLsh(qt, "qid", "qtok", dt, "doc_id", "dtok",
        "embedding", k = 5, candidatesPerToken = 0)
    }
  }
}
