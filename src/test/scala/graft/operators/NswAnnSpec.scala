package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/**
 * Batch-native NSW graph ANN: recall grid at the shipped driver-row
 * point (the PcaAnnSpec discipline — the row's oracle is brute force
 * because the shipped point measures recall 1), the beam/iteration
 * gradient that shows the search is genuinely approximate, and the
 * determinism/validation contract.
 */
class NswAnnSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "label",
    vendorCol = "label", descriptionCol = "label")
  private lazy val graph =
    NswAnn.build(emb, "vec_id", "embedding", degree = 16, entries = 8)

  private def qv(id: Int): Array[Float] =
    emb.where(col("vec_id") === id).select("embedding").head.getSeq[Float](0).toArray

  private def bruteIds(q: Array[Float], k: Int): Seq[String] =
    VectorSearch.bruteForce(emb, cfg, q, k, Map.empty, Some(6))
      .select("id").collect().map(_.getString(0)).toSeq

  private def nswIds(g: NswAnn.Graph, q: Array[Float], k: Int, beam: Int,
      maxIters: Int = 12): Seq[Long] =
    NswAnn.topK(emb, "vec_id", "embedding", g, q, k, beam, maxIters)
      .select("id").collect().map(_.getLong(0)).toSeq

  test("shipped point (degree=16, entries=8, beam=64): recall@10 = 1, ordered ≡ brute force") {
    // measured grid at sf0.001 (recall@10 for queries 1/3/7/42):
    //   deg=2,  entries=2, beam=16, iters=12 → 1,4,0,0   (not navigable)
    //   deg=4,  entries=8, beam=10, iters=12 → 1,8,7,1
    //   deg=4,  entries=8, beam=16, iters=12 → 7,8,7,3
    //   deg=16, entries=8, beam=16, iters=12 → 10,10,10,10
    //   deg=16, entries=8, beam=64, iters=12 → 10,10,10,10  ← shipped
    // The shipped row takes beam=64 for margin at sf0.01 (verified
    // green against the brute-force oracle there too).
    Seq(1, 3, 7, 42).foreach { qid =>
      val q = qv(qid)
      val got = NswAnn.topK(emb, "vec_id", "embedding", graph, q,
        k = 10, beam = 64).collect()
        .map(r => (r.getLong(0).toString, r.getDouble(1)))
      val want = VectorSearch.bruteForce(emb, cfg, q, 10, Map.empty, Some(6))
        .select(col("id"), col("score")).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(got.toSeq === want.toSeq, s"query $qid")
    }
  }

  test("recall is monotone in the beam width on a weak (degree 4) graph") {
    val weak = NswAnn.build(emb, "vec_id", "embedding", degree = 4, entries = 8)
    val q = qv(3)
    val want = bruteIds(q, 10).toSet
    val recalls = Seq(10, 16, 48).map { b =>
      nswIds(weak, q, 10, beam = b).map(_.toString).toSet.intersect(want).size
    }
    assert(recalls === recalls.sorted, s"recalls $recalls not monotone")
  }

  test("more hops never hurt: iters gradient on a weak graph") {
    val weak = NswAnn.build(emb, "vec_id", "embedding", degree = 4, entries = 8)
    val q = qv(3)
    val want = bruteIds(q, 10).toSet
    val r2 = nswIds(weak, q, 10, 16, maxIters = 2).map(_.toString).toSet
      .intersect(want).size
    val r12 = nswIds(weak, q, 10, 16, maxIters = 12).map(_.toString).toSet
      .intersect(want).size
    assert(r12 >= r2, s"iters 12 recall $r12 < iters 2 recall $r2")
    assert(r12 > 0)
  }

  test("deterministic: same graph, same query, same rows (twice)") {
    val q = qv(7)
    val a = NswAnn.topK(emb, "vec_id", "embedding", graph, q, 10, 32)
      .collect().map(_.toSeq).toSeq
    val b = NswAnn.topK(emb, "vec_id", "embedding", graph, q, 10, 32)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.size === 10)
  }

  test("entry points are the seeded md5-rank sample — reproducible") {
    val g2 = NswAnn.build(emb, "vec_id", "embedding", degree = 16, entries = 8)
    assert(graph.entryIds === g2.entryIds)
    assert(graph.entryIds.size === 8)
  }

  test("validation: k, beam, degree, entries, maxIters bounds") {
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 0, beam = 8)
    }
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 10, beam = 5)
    }
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 1, beam = 1,
        maxIters = 0)
    }
    intercept[IllegalArgumentException] {
      NswAnn.build(emb, "vec_id", "embedding", degree = 0)
    }
    intercept[IllegalArgumentException] {
      NswAnn.build(emb, "vec_id", "embedding", entries = 0)
    }
  }
}
