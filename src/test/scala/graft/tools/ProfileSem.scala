package graft.tools

import graft.GraftSession

import graft.operators._

/** Scratch profiler for dedup_semantic stages (not part of the library). */
object ProfileSem {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(d + "/embeddings.parquet")
    println("rows=" + emb.count())
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def pairs = SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
      bitsPerTable = 6, nTables = 64, threshold = 0.4, scale = 6)
    graft.functions.GraftFunctions.register(spark)
    time("pairs") { pairs.write.format("noop").mode("overwrite").save() }
    println("n_pairs=" + pairs.count())
    val keyed = emb.selectExpr("vec_id as id",
      "explode(cosine_lsh_keys(embedding, 6, 64, 42L)) as bkt")
    println("n_keyed=" + keyed.count())
    val cand = keyed.alias("a").join(keyed.alias("b"),
      org.apache.spark.sql.functions.col("a.bkt") === org.apache.spark.sql.functions.col("b.bkt") &&
      org.apache.spark.sql.functions.col("a.id") < org.apache.spark.sql.functions.col("b.id"))
    println("n_cand=" + cand.count())
    time("keyed_noop") { keyed.write.format("noop").mode("overwrite").save() }
    time("cand_noop") { cand.write.format("noop").mode("overwrite").save() }
    val p = pairs.localCheckpoint(true)
    time("components") { ConnectedComponents.components(p, "a_id", "b_id")
      .write.format("noop").mode("overwrite").save() }
    time("full") { Dedup.semanticKeepVerdict(emb, "vec_id", pairs)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
