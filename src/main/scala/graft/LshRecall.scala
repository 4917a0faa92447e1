package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/**
 * MinHash-LSH quality report: recall of [[graft.operators.Dedup.minHashPairs]]
 * against exact all-pairs shingle-Jaccard ground truth, across band
 * counts — the measured S-curve for picking `bands × rowsPerBand` at a
 * target threshold. Offline tool: the all-pairs ground-truth join is
 * quadratic and belongs in a report, never in a pipeline.
 * Prints one JSON line.
 */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val threshold = 0.5
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(col("doc_id").as("id"),
      call_function("shingle_set", col("text")).as("s"))
    val a = base.alias("a"); val b = base.alias("b")
    val truth = a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("j"))
      .filter(col("j") >= threshold)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val byBands = Seq(4, 8, 16).map { bands =>
      val found = graft.operators.Dedup.minHashPairs(docs, "doc_id", "text",
        bands = bands, rowsPerBand = 4, threshold = threshold)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (truth.isEmpty) 1.0
        else (truth intersect found).size.toDouble / truth.size
      bands -> recall
    }
    val json = byBands.map { case (bs, r) =>
      s""""$bs":${math.rint(r * 10000) / 10000}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"lsh_recall@j$threshold","truth_pairs":${truth.size},"rows_per_band":4,"recall_by_bands":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
