package graft.operators

import graft.SparkFunSuite
import graft.functions.{GraftFunctions, VectorKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

class Sq8AnnSpec extends SparkFunSuite {

  private def emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("sq8Encode kernel: grid endpoints, clamping, degenerate dims, nulls") {
    val mins = new GenericArrayData(Array(0.0, -1.0, 5.0))
    val deltas = new GenericArrayData(Array(1.0 / 255, 2.0 / 255, 0.0))
    def enc(xs: Float*): Array[Byte] =
      VectorKernels.sq8Encode(new GenericArrayData(xs.toArray), mins, deltas)
    assert(enc(0f, -1f, 5f).toSeq === Seq[Byte](0, 0, 0))           // grid minima
    assert(enc(1f, 1f, 5f).toSeq === Seq[Byte](-1, -1, 0))          // maxima → 255
    assert(enc(0.5f, 0f, 99f).map(_ & 0xff).toSeq === Seq(128, 128, 0)) // rint midpoints
    assert(enc(-9f, 9f, 5f).map(_ & 0xff).toSeq === Seq(0, 255, 0)) // out-of-grid clamps
    assert(VectorKernels.sq8Encode(
      new GenericArrayData(Array(0.1f)), mins, deltas) === null)    // dim mismatch
  }

  test("sq8CosScore: reconstruction identity — score of a code equals cosine of the decoded vector") {
    val mins = Array(-0.3, 0.1, -1.0, 0.4)
    val deltas = Array(0.01, 0.02, 0.004, 0.015)
    val q = Array(0.3f, -0.8f, 0.25f, 0.9f)
    val codes = Array[Byte](5, -1, 100, 0)
    // build the flat table the way SqAnn.topK does
    val d = 4
    val w = Array.tabulate(d)(i => deltas(i) * q(i))
    val a = Array.tabulate(d)(i => 2.0 * mins(i) * deltas(i))
    val b = Array.tabulate(d)(i => deltas(i) * deltas(i))
    val biasDot = (0 until d).map(i => mins(i) * q(i)).sum
    val biasN = (0 until d).map(i => mins(i) * mins(i)).sum
    val flat = new GenericArrayData(Array(biasDot, biasN) ++ w ++ a ++ b)
    val got = VectorKernels.sq8CosScore(codes, flat).doubleValue()
    val vhat = Array.tabulate(d)(i => mins(i) + (codes(i) & 0xff) * deltas(i))
    val dot = (0 until d).map(i => vhat(i) * q(i)).sum
    val nrm = math.sqrt(vhat.map(x => x * x).sum)
    assert(math.abs(got - dot / nrm) < 1e-12)
    // size-mismatched table → null, never garbage
    assert(VectorKernels.sq8CosScore(codes, new GenericArrayData(Array(1.0))) === null)
  }

  test("column path ≡ kernel: encode and score agree between codegen and direct call") {
    GraftFunctions.register(spark)
    val model = SqAnn.fit(emb, "embedding")
    val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val minsL = typedLit(model.mins.toSeq)
    val deltasL = typedLit(model.deltas.toSeq)
    val rows = emb.limit(8)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.sq8Encode(col("embedding"), minsL, deltasL).as("codes"))
      .collect()
    rows.foreach { r =>
      val vec = new GenericArrayData(r.getSeq[Float](1).toArray)
      val expect = VectorKernels.sq8Encode(vec,
        new GenericArrayData(model.mins), new GenericArrayData(model.deltas))
      assert(r.getAs[Array[Byte]]("codes").toSeq === expect.toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("quantization error is bounded by delta/2 per dimension") {
    val model = SqAnn.fit(emb, "embedding")
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    vecs.foreach { v =>
      val codes = VectorKernels.sq8Encode(new GenericArrayData(v),
        new GenericArrayData(model.mins), new GenericArrayData(model.deltas))
      v.indices.foreach { i =>
        val vhat = model.mins(i) + (codes(i) & 0xff) * model.deltas(i)
        assert(math.abs(vhat - v(i)) <= model.deltas(i) / 2 + 1e-9,
          s"dim $i: ${v(i)} vs $vhat (delta ${model.deltas(i)})")
      }
    }
  }

  test("self-match ranks first and recall vs brute force is 1 at candidates=64 on sf0.001") {
    GraftFunctions.register(spark)
    val model = SqAnn.fit(emb, "embedding")
    val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val qv = typedLit(q.toSeq)
    val exact = emb.select(col("vec_id"),
        round(GraftFunctions.knnCosineSimilarity(col("embedding"), qv), 6).as("s"))
      .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(8)
      .collect().map(_.getLong(0)).toSet
    val got = SqAnn.topK(emb, "vec_id", "embedding", q, model, k = 8, candidates = 64)
      .collect()
    assert(got.head.getLong(0) === 0L && got.head.getDouble(1) === 1.0)
    val recall = (exact & got.map(_.getLong(0)).toSet).size.toDouble / exact.size
    // 8-bit reconstruction is near-exact: unlike the 1-bit sketch's
    // 0.75 floor, SQ8 must not lose a single true neighbor here.
    assert(recall === 1.0, s"recall $recall")
  }

  test("measured recall grid: candidates sweep (documents the sizing rule)") {
    GraftFunctions.register(spark)
    val model = SqAnn.fit(emb, "embedding")
    val q = emb.where(col("vec_id") === 5).select("embedding").head.getSeq[Float](0).toArray
    val qv = typedLit(q.toSeq)
    val exact = emb.select(col("vec_id"),
        round(GraftFunctions.knnCosineSimilarity(col("embedding"), qv), 6).as("s"))
      .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(8)
      .collect().map(_.getLong(0)).toSet
    val grid = Seq(8, 16, 32).map { c =>
      val ids = SqAnn.topK(emb, "vec_id", "embedding", q, model, k = 8, candidates = c)
        .collect().map(_.getLong(0)).toSet
      c -> (exact & ids).size.toDouble / exact.size
    }
    info(s"sq8 recall@8 by candidates: ${grid.map { case (c, r) => s"$c→$r" }.mkString(", ")}")
    // monotone non-decreasing in candidates; near-exact already at 2x k
    assert(grid.map(_._2) === grid.map(_._2).sorted)
    assert(grid.last._2 >= 0.875, s"grid $grid")
  }

  test("plan shape: heap candidate cut, broadcast join-back, no store-side shuffle") {
    val model = SqAnn.fit(emb, "embedding")
    val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val plan = SqAnn.topK(emb, "vec_id", "embedding", q, model, k = 8, candidates = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no heap top-k in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join-back in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"store-side shuffle join in:\n$plan")
  }

  test("composes with IVF: prune clusters, SQ8-scan survivors, exact re-rank") {
    import graft.operators.{IvfIndex, SearchStrategy}
    GraftFunctions.register(spark)
    val (assigned, ivf) = IvfIndex.build(emb, "embedding", numClusters = 4)
    val sq = SqAnn.fit(emb, "embedding")
    val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val top = ivf.rankClusters(q, SearchStrategy.CosineSimilarity).take(2)
    val pruned = assigned.filter(col(IvfIndex.ClusterCol)
      .isin(top.toIndexedSeq.map(Integer.valueOf): _*))
    val prunedN = pruned.count()
    assert(prunedN < emb.count(), "pruning must drop at least one cluster")
    val got = SqAnn.topK(pruned.drop(IvfIndex.ClusterCol), "vec_id", "embedding",
      q, sq, k = 8, candidates = 32).collect()
    // exactness WITHIN the pruned subset: SQ8 over the survivors equals
    // brute force over the survivors (candidate budget = 32 of ≤ half
    // the corpus — same near-exact regime as the full-corpus grid)
    val qv = typedLit(q.toSeq)
    val brute = pruned.select(col("vec_id"),
        round(GraftFunctions.knnCosineSimilarity(col("embedding"), qv), 6).as("s"))
      .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(8)
      .collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getLong(0)).toSeq === brute)
    assert(got.head.getLong(0) === 0L) // self lives in the top-ranked cluster
  }

  test("validation: k, candidates, and model dimension") {
    val model = SqAnn.SqModel(Array(0.0, 0.0), Array(0.1, 0.1))
    val q2 = Array(0.1f, 0.2f)
    intercept[IllegalArgumentException](
      SqAnn.topK(emb, "vec_id", "embedding", q2, model, k = 0, candidates = 8))
    intercept[IllegalArgumentException](
      SqAnn.topK(emb, "vec_id", "embedding", q2, model, k = 9, candidates = 8))
    intercept[IllegalArgumentException](
      SqAnn.topK(emb, "vec_id", "embedding", Array(0.1f), model, k = 2, candidates = 8))
    intercept[IllegalArgumentException](SqAnn.SqModel(Array(0.0), Array(0.1, 0.2)))
  }
}
