package graft.operators

import graft.SparkFunSuite
import graft.functions.{GraftFunctions, VectorKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

class BitSketchAnnSpec extends SparkFunSuite {

  private def emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("signBits64 kernel: bit i set iff vec(i) >= 0, truncated at 64 dims") {
    def bits(xs: Float*): Long =
      VectorKernels.signBits64(new GenericArrayData(xs.toArray)).longValue()
    assert(bits(1f, -1f, 0f, -0.5f) === ((1L << 0) | (1L << 2)))
    assert(bits() === 0L)
    // dims past 64 are ignored
    val long = Array.fill(70)(1f)
    assert(VectorKernels.signBits64(new GenericArrayData(long)).longValue() === -1L)
  }

  test("sketch column equals driver-side querySketch on the same vector") {
    GraftFunctions.register(spark)
    val row0 = emb.where(col("vec_id") === 0)
    val colBits = row0.select(GraftFunctions.signBits64(col("embedding"))).head.getLong(0)
    val q = row0.select("embedding").head.getSeq[Float](0).toArray
    assert(colBits === BitSketchAnn.querySketch(q))
  }

  test("hamming of a vector with itself is 0 and self-match ranks first") {
    val q = emb.where(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val rows = BitSketchAnn.topK(emb, "vec_id", "embedding", q,
      k = 4, candidates = 16).collect()
    assert(rows.length === 4)
    assert(rows.head.getLong(0) === 0L)     // self
    assert(rows.head.getLong(1) === 0L)     // hamming 0
    assert(rows.head.getDouble(2) === 1.0)  // exact cosine of self
    // final order is (score DESC, id)
    val scores = rows.map(r => (r.getDouble(2), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy { case (s, i) => (-s, i) }))
  }

  test("recall vs exact brute force at candidates=64 on sf0.001") {
    GraftFunctions.register(spark)
    val q = emb.where(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val qv = typedLit(q.toSeq)
    val exact = emb.select(col("vec_id"),
        round(GraftFunctions.knnCosineSimilarity(col("embedding"), qv), 6).as("s"))
      .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(8)
      .collect().map(_.getLong(0)).toSet
    val approx = BitSketchAnn.topK(emb, "vec_id", "embedding", q,
      k = 8, candidates = 64).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 64-bit sign sketches over 64 candidates from 60 rows: pin the
    // measured floor, not perfection — re-rank is exact either way.
    assert(recall >= 0.75, s"recall $recall")
  }

  test("plan shape: heap-based candidate cut and broadcast join-back, no big-side shuffle") {
    val q = emb.where(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val plan = BitSketchAnn.topK(emb, "vec_id", "embedding", q,
      k = 8, candidates = 64).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no heap top-k in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join-back in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"store-side shuffle join in:\n$plan")
  }

  test("validation: k and candidates") {
    val q = Array.fill(64)(0.1f)
    intercept[IllegalArgumentException](
      BitSketchAnn.topK(emb, "vec_id", "embedding", q, k = 0, candidates = 8))
    intercept[IllegalArgumentException](
      BitSketchAnn.topK(emb, "vec_id", "embedding", q, k = 9, candidates = 8))
  }
}
