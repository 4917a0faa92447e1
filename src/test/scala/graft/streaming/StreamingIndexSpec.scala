package graft.streaming

import graft.SparkFunSuite
import graft.operators.{IvfIndex, StoreConfig, VectorSearch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class StreamedVec(vec_id: Long, embedding: Seq[Float], label: Int)

class StreamingIndexSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "label",
    vendorCol = "label", descriptionCol = "label")

  private def qv(id: Int): Array[Float] =
    emb.where(col("vec_id") === id).select("embedding").head.getSeq[Float](0).toArray

  test("streamed appends: store is complete and full-breadth search equals brute force") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") < 250)
    val (assigned, model) = IvfIndex.build(base, "embedding", numClusters = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_stream_ivf").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    IvfIndex.writePartitioned(assigned, path)

    val rows = emb.filter(col("vec_id") >= 250).as[StreamedVec].collect()
    val (batch1, batch2) = rows.partition(_.vec_id < 375)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamedVec]
    val query = StreamingIndex.appendStream(
      input.toDF(), "embedding", model, path, checkpoint)
    input.addData(batch1.toIndexedSeq)
    query.processAllAvailable()
    input.addData(batch2.toIndexedSeq)
    query.processAllAvailable()
    query.stop()

    val merged = spark.read.parquet(path)
    assert(merged.count() === emb.count()) // nothing lost or duplicated
    val ivf = IvfIndex.search(merged, model, cfg, qv(7), k = 10,
      searchTopSize = model.numClusters, scoreScale = Some(6))
      .select("id", "score").collect()
    val brute = VectorSearch.bruteForce(emb, cfg, qv(7), 10, Map.empty, Some(6))
      .select("id", "score").collect()
    assert(ivf.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
  }

  test("appendStream rejects a batch DataFrame") {
    val (_, model) = IvfIndex.build(emb.limit(50), "embedding", numClusters = 4)
    intercept[IllegalArgumentException] {
      StreamingIndex.appendStream(emb, "embedding", model, "/tmp/x", "/tmp/y")
    }
  }
}
