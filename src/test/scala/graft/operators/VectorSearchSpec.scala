package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val store = emb.join(docs, col("vec_id") === col("doc_id"))
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
    vendorCol = "lang", descriptionCol = "text")

  private def qv: Array[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray

  test("self-query ranks itself first with score 1.0 (cosine)") {
    val top = VectorSearch.bruteForce(store, cfg, qv, 4).collect()
    assert(top.length === 4)
    assert(top.head.getString(0) === "0")
    assert(math.abs(top.head.getDouble(4) - 1.0) < 1e-9)
    // strictly non-increasing scores
    val scores = top.map(_.getDouble(4))
    assert(scores.sliding(2).forall { case Array(x, y) => x >= y })
  }

  test("distance strategy sorts ascending; self-distance 0") {
    val top = VectorSearch.bruteForce(
      store, cfg.copy(strategy = SearchStrategy.EuclideanDistance), qv, 4).collect()
    assert(top.head.getString(0) === "0")
    assert(top.head.getDouble(4) === 0.0)
    val scores = top.map(_.getDouble(4))
    assert(scores.sliding(2).forall { case Array(x, y) => x <= y })
  }

  test("k validation: k <= 0 rejected (app.py:368-370 parity)") {
    intercept[IllegalArgumentException] {
      VectorSearch.bruteForce(store, cfg, qv, 0)
    }
  }

  test("filter×index exclusivity error (app.py:171-172 parity)") {
    intercept[IllegalArgumentException] {
      VectorSearch.bruteForce(store, cfg.copy(indexEnabled = true), qv, 4,
        Map("lang" -> "en"))
    }
  }

  test("filter keys restricted to the configured string columns") {
    intercept[IllegalArgumentException] {
      VectorSearch.bruteForce(store, cfg, qv, 4, Map("label" -> "3"))
    }
  }

  test("equality filter applies before top-k") {
    val top = VectorSearch.bruteForce(store, cfg, qv, 8, Map("lang" -> "en")).collect()
    assert(top.nonEmpty)
    assert(top.forall(_.getString(2) === "en"))
  }

  test("searchWithMetadata (top-k then join) == bruteForce over the join") {
    val a = VectorSearch.searchWithMetadata(emb, docs, ("vec_id", "doc_id"),
      cfg, qv, 10, Map.empty, Some(6)).collect()
    val b = VectorSearch.bruteForce(store, cfg, qv, 10, Map.empty, Some(6)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("physical plan is TakeOrderedAndProject (no full sort/shuffle)") {
    val plan = VectorSearch.bruteForce(store, cfg, qv, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("top-k result is invariant under input row order") {
    val shuffled = store.orderBy(rand(7))
    val a = VectorSearch.bruteForce(shuffled, cfg, qv, 6, Map.empty, Some(6)).collect()
    val b = VectorSearch.bruteForce(store, cfg, qv, 6, Map.empty, Some(6)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("CosineDistance rounds the similarity, then subtracts (determinism shim)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val d = Seq((Seq(1f, 2f, 3f), Seq(3f, 1f, 2f))).toDF("a", "b")
    val Array(row) = d.select(
      SearchStrategy.CosineDistance.roundedScore(col("a"), col("b"), 6).as("dist"),
      round(lit(1.0) - round(graft.functions.GraftFunctions
        .knnCosineSimilarity(col("a"), col("b")), 6), 6).as("expected"))
      .collect()
    assert(row.getDouble(0) === row.getDouble(1))
    // and top-k through the full path agrees with DESC-similarity order
    val distCfg = cfg.copy(strategy = SearchStrategy.CosineDistance)
    val simIds = VectorSearch.bruteForce(store, cfg, qv, 6, Map.empty, Some(6))
      .select("id").collect().map(_.getString(0)).toSeq
    val distIds = VectorSearch.bruteForce(store, distCfg, qv, 6, Map.empty, Some(6))
      .select("id").collect().map(_.getString(0)).toSeq
    assert(distIds === simIds)
  }

  test("strategy suffix rule drives sort direction (app.py:55)") {
    assert(SearchStrategy.CosineSimilarity.descending)
    assert(SearchStrategy.InnerProductSimilarity.descending)
    assert(!SearchStrategy.CosineDistance.descending)
    assert(!SearchStrategy.EuclideanDistance.descending)
    assert(!SearchStrategy.ManhattanDistance.descending)
    assert(SearchStrategy.fromString("CosineSimilarity") === SearchStrategy.CosineSimilarity)
    intercept[IllegalArgumentException](SearchStrategy.fromString("L2"))
  }
}
