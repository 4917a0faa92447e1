package graft.tools

import graft.GraftSession
import graft.operators.{ConnectedComponents, SimilarityJoin}

/** Times the two CC formulations on the real driver pair graph
  * (sf0.1 banded-LSH cosine pairs) — the measurement behind which
  * variant `dedup_semantic` ships with.
  * Run: sbt "Test/runMain graft.tools.CcProbe [sfDir]" */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
      bitsPerTable = 6, nTables = 64, threshold = 0.4, maxBucket = Some(1024))
      .cache()
    println(s"[cc-probe] edges=${pairs.count()}")
    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[cc-probe] $name best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("pointer-doubling") {
      ConnectedComponents.components(pairs, "a_id", "b_id").count()
    }
    time("alternating-star") {
      ConnectedComponents.componentsAlternating(pairs, "a_id", "b_id").count()
    }
  }
}
