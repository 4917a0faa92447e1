package graft.tools

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.SimilarityJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measurement harness behind SCALING.md's LSH section: bucket-size
 * histograms, candidate volumes, and verified-pair counts for the banded
 * cosine LSH at three corpus scales — sf0.01 (500 rows), sf0.1 (2,000),
 * and a synthetic 10× corpus (20,000) built from the same statistical
 * recipe as the testdata embeddings (dim-64 gaussian rows with a ~5%
 * perturbed-duplicate fraction, in independent 2,000-row shards so true
 * near-dup density stays constant as the corpus grows).
 *
 * Candidate volume is computed WITHOUT running the self-join:
 * sum over buckets of c·(c−1)/2 — the exact number of candidate rows the
 * bucket join would emit. Run: sbt "Test/runMain graft.tools.LshScaleProbe"
 */
object LshScaleProbe {

  /** Synthetic corpus: `nShards` independent shards of `rowsPerShard`
    * dim-64 gaussian vectors; each row is, with probability `dupFrac`, a
    * small perturbation of an earlier same-shard row (a true near-dup,
    * cosine ≈ 0.99) instead of fresh noise. Deterministic per shard. */
  def synthShards(spark: SparkSession, nShards: Int, rowsPerShard: Int = 2000,
      dim: Int = 64, dupFrac: Double = 0.05): DataFrame = {
    import spark.implicits._
    val rows = (0 until nShards).flatMap { s =>
      val rng = new java.util.Random(1000L + s)
      val base = scala.collection.mutable.ArrayBuffer[Array[Float]]()
      (0 until rowsPerShard).map { i =>
        val v =
          if (i > 0 && rng.nextDouble() < dupFrac) {
            val src = base(rng.nextInt(base.length))
            src.map(x => x + 0.05f * rng.nextGaussian().toFloat)
          } else Array.fill(dim)(rng.nextGaussian().toFloat)
        base += v
        (s.toLong * rowsPerShard + i, v.toSeq)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  def probe(spark: SparkSession, name: String, emb: DataFrame,
      bits: Int, tables: Int, cap: Option[Int], verify: Boolean): Unit = {
    GraftFunctions.register(spark)
    val n = emb.count()
    val keyed = emb.select(col("vec_id").as("id"),
      explode(GraftFunctions.cosineLshKeys(col("embedding"), bits, tables, 42L)).as("bkt"))
    val sizes = keyed.groupBy("bkt").agg(count(lit(1)).as("c")).cache()
    val r = sizes.agg(
      count(lit(1)).as("n_buckets"),
      avg("c").as("avg"),
      expr("percentile(c, 0.5)").as("p50"),
      expr("percentile(c, 0.99)").as("p99"),
      max("c").as("max"),
      sum(expr("c * (c - 1) div 2")).as("cand_volume"),
      sum(when(col("c") > cap.getOrElse(Int.MaxValue),
        expr("c * (c - 1) div 2")).otherwise(lit(0L))).as("cand_dropped_by_cap")
    ).head
    sizes.unpersist()
    val verified = if (verify) {
      SimilarityJoin.lshCosinePairsBanded(emb, "vec_id", "embedding",
        bitsPerTable = bits, nTables = tables, threshold = 0.4, maxBucket = cap).count()
    } else -1L
    println(f"[probe] $name%-28s n=$n%6d bits=$bits%2d tables=$tables%3d " +
      f"cap=${cap.getOrElse(-1)}%6d buckets=${r.getLong(0)}%8d " +
      f"avg=${r.getDouble(1)}%8.2f p50=${r.getDouble(2)}%6.0f p99=${r.getDouble(3)}%8.0f " +
      f"max=${r.getLong(4)}%7d cand=${r.getLong(5)}%12d " +
      f"capDrop=${r.getLong(6)}%12d pairs>=0.4=$verified%8d")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val sf01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val synth1 = synthShards(spark, 1)
    val synth3 = synthShards(spark, 3)
    val synth10 = synthShards(spark, 10)

    // Shipped parameters at the real testdata scales (recall-1 regime).
    probe(spark, "sf0.01/shipped", sf001, 6, 64, None, verify = true)
    probe(spark, "sf0.1/shipped", sf01, 6, 64, None, verify = true)
    probe(spark, "sf0.1/shipped+cap", sf01, 6, 64, Some(1024), verify = true)
    // Growth at fixed bits: candidate volume is ~n²/2^bits per table.
    probe(spark, "synth-2k/bits6", synth1, 6, 64, None, verify = true)
    probe(spark, "synth-6k/bits6", synth3, 6, 64, None, verify = true)
    probe(spark, "synth-20k/bits6", synth10, 6, 64, None, verify = false)
    // The scale knob: bits grows with log2(n) → per-bucket size constant.
    probe(spark, "synth-20k/bits9", synth10, 9, 64, None, verify = true)
    probe(spark, "synth-20k/bits12", synth10, 12, 64, None, verify = true)
    // Cap interaction at the bigger corpus.
    probe(spark, "synth-20k/bits9+cap", synth10, 9, 64, Some(1024), verify = true)
    spark.stop()
  }
}
