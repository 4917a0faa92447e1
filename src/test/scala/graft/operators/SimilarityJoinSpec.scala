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

  test("no cartesian product in either plan") {
    Seq(
      SimilarityJoin.blockedCosinePairs(emb, "vec_id", "embedding", "label", 0.3),
      SimilarityJoin.lshCosinePairs(emb, "vec_id", "embedding", 64)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }
}
