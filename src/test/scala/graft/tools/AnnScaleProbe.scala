package graft.tools

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.{BitSketchAnn, IvfIndex, StoreConfig}
import org.apache.spark.sql.functions._

/**
 * Measurement harness behind SCALING.md's second-scale ANN table: the
 * recall/latency grid of the index families (IVF flat, 2-level kmeans
 * tree, sign-bit sketch) at a 40× corpus (20,000 rows vs the sf0.01
 * fixture's 500), with cluster count scaled to keep rows-per-cluster
 * roughly constant — the local emulation of the "a cluster ≈ a few GB"
 * rule, where C grows with the corpus and the centroid sidecar stays
 * driver-sized.
 *
 * Recall@10 is averaged over 20 corpus queries against the exact
 * brute-force cosine top-10; latency is the mean per-query wall time
 * of the search's collect() after one untimed warmup.
 *
 * Run: sbt "Test/runMain graft.tools.AnnScaleProbe"
 */
object AnnScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    // Same synthetic recipe as the LSH growth table: 10 × 2,000-row
    // gaussian shards, ~5% planted near-dups. Dummy store columns keep
    // StoreConfig's canonical projection satisfied.
    val emb = LshScaleProbe.synthShards(spark, 10)
      .withColumn("source", lit("synth"))
      .withColumn("lang", lit("xx"))
      .withColumn("text", lit(""))
      .cache()
    val n = emb.count()
    val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
      vendorCol = "lang", descriptionCol = "text", embeddingCol = "embedding")
    val k = 10
    val queries = emb.orderBy("vec_id").limit(20)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    def exactTopK(q: Array[Float]): Set[Long] =
      emb.select(col("vec_id"),
          GraftFunctions.knnCosineSimilarity(col("embedding"), typedLit(q.toSeq)).as("s"))
        .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(k)
        .collect().map(_.getLong(0)).toSet
    val truth = queries.map { case (id, q) => id -> exactTopK(q) }.toMap
    println(s"[ann-probe] n=$n queries=${queries.length} k=$k")

    def grid(name: String, run: Array[Float] => Set[Long]): Unit = {
      run(queries.head._2) // warmup, untimed
      val t0 = System.nanoTime()
      val recalls = queries.map { case (qid, q) =>
        (truth(qid) & run(q)).size.toDouble / k
      }
      val ms = (System.nanoTime() - t0) / 1e6 / queries.length
      val recall = recalls.sum / recalls.length
      println(f"[ann-probe] $name%-34s recall@$k=$recall%.3f latency=$ms%8.1f ms/query")
    }

    // --- IVF flat at scaled cluster counts. The sf fixtures run C=8 at
    //     n=500 (~62 rows/cluster); constant rows-per-cluster at n=20k
    //     gives C=320. C=32 shows what NOT scaling C costs in latency.
    for (c <- Seq(32, 320)) {
      val (assigned, model) = IvfIndex.build(emb, "embedding", numClusters = c)
      val cached = assigned.cache(); cached.count()
      for (top <- Seq(1, 2, 4, 8, 16, 32, 64, 128, c).distinct.filter(_ <= c)) {
        grid(s"ivf C=$c top=$top",
          q => IvfIndex.search(cached, model, cfg, q, k = k, searchTopSize = top)
            .collect().map(_.getString(0).toLong).toSet) // canonical id is string
      }
      // --- 2-level tree over the same store: macro level ~sqrt(C).
      val tree = IvfIndex.buildTree(model, macroClusters = math.sqrt(c).round.toInt)
      for (top <- Seq(2, 4, 8).filter(_ <= c)) {
        grid(s"tree C=$c macro=${math.sqrt(c).round} top=$top",
          q => IvfIndex.searchTree(cached, tree, cfg, q, k = k, searchTopSize = top)
            .collect().map(_.getString(0).toLong).toSet)
      }
      cached.unpersist()
    }

    // --- Sign-bit sketch: budget→recall is spectrum-independent; the
    //     candidate count must scale with n to hold recall.
    for (cand <- Seq(64, 256, 1024)) {
      grid(s"bitsketch cand=$cand",
        q => BitSketchAnn.topK(emb, "vec_id", "embedding", q, k = k,
          candidates = cand).collect().map(_.getLong(0)).toSet)
    }

    // --- IVF-PQ (the composed billion-scale shape): C=320 coarse
    //     prune + LEARNED m=8/k=16 codebook ADC + exact re-rank.
    //     Truth here is EUCLIDEAN top-10 (the re-rank metric); the
    //     grid sweeps probe breadth × candidate budget to show which
    //     knob recall actually follows at constant scan fraction.
    {
      def exactTopKEuc(q: Array[Float]): Set[Long] =
        emb.select(col("vec_id"),
            GraftFunctions.knnEuclideanDistance(col("embedding"), typedLit(q.toSeq)).as("s"))
          .orderBy(col("s").asc_nulls_last, col("vec_id")).limit(k)
          .collect().map(_.getLong(0)).toSet
      val truthEuc = queries.map { case (id, q) => id -> exactTopKEuc(q) }.toMap
      def gridEuc(name: String, run: Array[Float] => Set[Long]): Unit = {
        run(queries.head._2)
        val t0 = System.nanoTime()
        val recalls = queries.map { case (qid, q) =>
          (truthEuc(qid) & run(q)).size.toDouble / k
        }
        val ms = (System.nanoTime() - t0) / 1e6 / queries.length
        println(f"[ann-probe] $name%-34s recall@$k=${recalls.sum / recalls.length}%.3f latency=$ms%8.1f ms/query")
      }
      val c = 320
      val (assigned, ivf) = IvfIndex.build(emb, "embedding", numClusters = c)
      val pq = graft.operators.PqIndex.train(emb, "embedding", m = 8, k = 16)
      val encoded = graft.operators.PqIndex.encode(assigned, "embedding", pq)
        .cache()
      encoded.count()
      for (top <- Seq(8, 32, 320); cand <- Seq(32, 128)) {
        gridEuc(s"ivfpq C=$c top=$top cand=$cand",
          q => graft.operators.PqIndex.ivfPqSearch(encoded, ivf, pq,
            "vec_id", "embedding", q, k = k, searchTopSize = top,
            candidates = cand).collect().map(_.getLong(0)).toSet)
      }
      encoded.unpersist()
    }
    spark.stop()
  }
}
