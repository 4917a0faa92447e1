package graft

import graft.operators._
import org.apache.spark.sql.functions._

/**
 * ANN quality report: average recall@k of the IVF index vs brute-force
 * ground truth, across the searchTopSize breadth knob — the measured
 * version of the reference's accuracy/latency trade-off
 * (`KMeansTreeSearchTopSize`, /root/reference/app.py:60,186-191).
 * Prints one JSON line.
 */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = 20
    val k = 10
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val store = emb.join(docs, col("vec_id") === col("doc_id"))
    val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
      vendorCol = "lang", descriptionCol = "text")
    val (assigned, model) = IvfIndex.build(store, "embedding", numClusters = 8)
    assigned.cache().count()

    val queryVecs = emb.where(col("vec_id") < nQueries)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    val truths = queryVecs.map { case (id, v) =>
      id -> VectorSearch.bruteForce(store, cfg, v, k).collect().map(_.getString(0)).toSet
    }.toMap

    val breadths = Seq(1, 2, 4, 8)
    val recalls = breadths.map { ts =>
      val r = queryVecs.map { case (id, v) =>
        val got = IvfIndex.search(assigned, model, cfg, v, k, ts)
          .collect().map(_.getString(0)).toSet
        (got intersect truths(id)).size.toDouble / truths(id).size
      }.sum / nQueries
      ts -> r
    }
    val json = recalls.map { case (ts, r) => s""""$ts":${math.rint(r * 1000) / 1000}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"ivf_recall@$k","queries":$nQueries,"clusters":${model.numClusters},"recall_by_top_size":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
