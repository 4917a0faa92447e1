package graft.streaming

import graft.SparkFunSuite
import graft.operators.{IvfIndex, SearchStrategy, StoreConfig, VectorSearch}
import org.apache.spark.sql.functions._

/**
 * Streaming ANN ingestion: the streamed partitioned store must be
 * row-identical to the batch [[IvfIndex.assignBatch]] path (same
 * frozen centroids, same codegen kernel), land the same
 * `cluster_id=` partition layout on disk, and search to brute-force
 * parity at full breadth.
 */
class VectorIngestSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  private lazy val ingested: (String, IvfIndex.IvfModel) = {
    val store = emb.join(docs, col("vec_id") === col("doc_id"))
    val (_, model) = IvfIndex.build(store, "embedding", numClusters = 8)
    val src = java.nio.file.Files
      .createTempDirectory("vingest_src_spec").toString
    emb.repartition(3).write.mode("overwrite").parquet(src)
    val out = java.nio.file.Files
      .createTempDirectory("vingest_store_spec").toString
    VectorIngest.ingestPartitioned(spark, src, s"$Sf0001/documents.parquet",
      "vec_id", "doc_id", "embedding", model, out)
    (out, model)
  }

  test("streamed store ≡ batch assignBatch assignments, nothing lost or duplicated") {
    val (out, model) = ingested
    val streamed = spark.read.parquet(out)
      .select(col("vec_id"), col(IvfIndex.ClusterCol).cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val batch = IvfIndex.assignBatch(
        emb.join(docs, col("vec_id") === col("doc_id")), "embedding", model)
      .select(col("vec_id"), col(IvfIndex.ClusterCol).cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("sink lands the cluster_id partition layout; several micro-batches ran") {
    val (out, _) = ingested
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"${IvfIndex.ClusterCol}="))
    assert(dirs.length >= 2, s"expected partition dirs, got ${dirs.length}")
    // 3 source files at maxFilesPerTrigger=1 ⇒ ≥3 commits in the sink log
    val commits = new java.io.File(s"$out/_spark_metadata").listFiles()
      .filter(_.getName.matches("\\d+"))
    assert(commits.length >= 3,
      s"expected >=3 micro-batch commits, got ${commits.length}")
  }

  test("full-breadth search over the streamed store ≡ brute force") {
    val (out, model) = ingested
    val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
      vendorCol = "lang", descriptionCol = "text",
      embeddingCol = "embedding")
    val q = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = IvfIndex.search(spark.read.parquet(out), model, cfg, q,
        k = 10, searchTopSize = 8, scoreScale = Some(6))
      .collect().map(_.toSeq).toSeq
    val want = VectorSearch.bruteForce(
        emb.join(docs, col("vec_id") === col("doc_id")), cfg, q,
        10, Map.empty, Some(6))
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}
