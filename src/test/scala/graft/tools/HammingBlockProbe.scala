package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measurement harness behind SCALING.md's Hamming-block section: the
 * random-collision candidate volume of the single-block scheme
 * (`Dedup.hammingNearPairs`, 4 × 16-bit keys) vs the multi-block
 * scheme (`Dedup.hammingNearPairsWide`, C(6,3) = 20 × ~32-bit packed
 * keys) as the corpus grows — the quantitative form of the
 * "16-bit blocks collide with p ≈ n/2^16" caveat.
 *
 * Corpus model: uniform random 64-bit fingerprints plus a ~5% planted
 * near-dup fraction (a prior row with ≤ 3 bits flipped — true
 * Hamming-≤3 pairs). Uniform is the right model for the RANDOM
 * collision rate: real SimHashes have biased bits, which only makes
 * block collisions more frequent, so the uniform numbers are a floor.
 *
 * Candidate volume is computed WITHOUT running the self-join — sum
 * over (blk, key) buckets of c·(c−1)/2, exactly the rows the bucket
 * join would emit — and both operators are then run and compared for
 * identical verified output (recall 1 by pigeonhole on both sides).
 * Run: sbt "Test/runMain graft.tools.HammingBlockProbe"
 */
object HammingBlockProbe {

  /** `n` fingerprints, ~`dupFrac` of them a ≤3-bit flip of an earlier
    * row. Deterministic. */
  def synthHashes(spark: SparkSession, n: Int, dupFrac: Double = 0.05): DataFrame = {
    import spark.implicits._
    val rng = new java.util.Random(7L)
    val base = scala.collection.mutable.ArrayBuffer[Long]()
    val rows = (0 until n).map { i =>
      val h =
        if (i > 0 && rng.nextDouble() < dupFrac) {
          var x = base(rng.nextInt(base.length))
          (0 to rng.nextInt(3)).foreach(_ => x ^= (1L << rng.nextInt(64)))
          x
        } else rng.nextLong()
      base += h
      (i.toLong, h)
    }
    rows.toDF("id", "h")
  }

  def probe(name: String, rows: DataFrame, keys: Seq[org.apache.spark.sql.Column],
      nTables: Int): Unit = {
    val n = rows.count()
    val keyed = rows.select(col("id"), explode(array(keys: _*)).as("bk"))
    val r = keyed.groupBy("bk").agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("n_buckets"),
        max("c").as("max"),
        sum(expr("c * (c - 1) div 2")).as("cand_volume"))
      .head
    println(f"[probe] $name%-22s n=$n%7d tables=$nTables%3d " +
      f"buckets=${r.getLong(0)}%9d max=${r.getLong(1)}%6d " +
      f"cand=${r.getLong(2)}%12d cand/n=${r.getLong(2).toDouble / n}%10.2f")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(2000, 20000, 200000)) {
      val rows = synthHashes(spark, n).cache()
      rows.count()
      probe(s"n=$n/narrow-4x16", rows,
        Dedup.hammingNarrowKeys(col("h"), nBlocks = 4, bits = 64), 4)
      probe(s"n=$n/wide-C(6,3)x32", rows,
        Dedup.hammingWideKeys(col("h"), nBlocks = 6, maxHamming = 3, bits = 64), 20)
      probe(s"n=$n/wide-C(8,3)x40", rows,
        Dedup.hammingWideKeys(col("h"), nBlocks = 8, maxHamming = 3, bits = 64), 56)
      // Identical verified output (recall 1 by pigeonhole both ways).
      if (n <= 20000) {
        val narrow = Dedup.hammingNearPairs(rows, "id", "h",
          nBlocks = 4, maxHamming = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val wide = Dedup.hammingNearPairsWide(rows, "id", "h",
          nBlocks = 6, maxHamming = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[probe] n=$n verified pairs: narrow=${narrow.size} " +
          s"wide=${wide.size} equal=${narrow == wide}")
        assert(narrow == wide)
      }
      rows.unpersist()
    }
    spark.stop()
  }
}
