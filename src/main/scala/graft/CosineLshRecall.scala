package graft

import graft.functions.GraftFunctions
import graft.operators.SimilarityJoin
import org.apache.spark.sql.functions._

/**
 * Measured recall/cost report for the banded cosine LSH join
 * ([[graft.operators.SimilarityJoin.lshCosinePairsBanded]]): for each
 * (bitsPerTable, nTables) configuration, recall vs the exact all-pairs
 * threshold join and the candidate-pair count (the cost driver).
 * Parameter selection is measured, not guessed — same discipline as
 * `RecallReport` (ANN) and `LshRecall` (MinHash).
 *
 * Usage: runMain graft.CosineLshRecall [sfDir] [threshold]
 */
object CosineLshRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val exact = base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        GraftFunctions.knnCosineSimilarity(col("a.v"), col("b.v")).as("cs"))
      .filter(col("cs") >= threshold)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact pairs >= $threshold: ${exact.size}")

    for {
      bits <- Seq(2, 4, 6, 8)
      tables <- Seq(8, 16, 32, 64)
    } {
      val keyed = emb.select(col("vec_id").as("id"),
        explode(GraftFunctions.cosineLshKeys(col("embedding"), bits, tables, 42L)).as("bkt"))
      val candidates = keyed.as("a")
        .join(keyed.as("b"), col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .dropDuplicates("a_id", "b_id")
      val nCand = candidates.count()
      val got = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
        bitsPerTable = bits, nTables = tables, threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = if (exact.isEmpty) 1.0
        else got.intersect(exact).size.toDouble / exact.size
      println(f"bits=$bits%d tables=$tables%2d  recall=$recall%.4f  candidates=$nCand%,d")
    }
    spark.stop()
  }
}
