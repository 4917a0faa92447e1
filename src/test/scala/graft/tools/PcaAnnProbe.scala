package graft.tools

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.{BitSketchAnn, Pca}
import org.apache.spark.sql.functions._

/**
 * Measurement harness behind SCALING.md's PCA section: how much of the
 * exact top-10 survives when candidate generation runs in a
 * PCA-reduced space (d ∈ {8, 16, 32} of 64), and what the sign-sketch
 * (`ann_bitsketch_topk`) recall looks like at several candidate
 * budgets. Recall is averaged over `nQueries` corpus queries against
 * the full-dimension brute-force cosine ground truth.
 *
 * Run: sbt "Test/runMain graft.tools.PcaAnnProbe [sfDir]"
 */
object PcaAnnProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    GraftFunctions.register(spark)
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val nQueries = 20
    val k = 10
    val queries = emb.orderBy("vec_id").limit(nQueries)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    def exactTopK(q: Array[Float]): Set[Long] =
      emb.select(col("vec_id"),
          GraftFunctions.knnCosineSimilarity(col("embedding"), typedLit(q.toSeq)).as("s"))
        .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(k)
        .collect().map(_.getLong(0)).toSet

    val truth = queries.map { case (id, q) => id -> exactTopK(q) }.toMap

    println(s"[pca-ann-probe] corpus=$sfDir n=$n queries=$nQueries k=$k")

    // --- PCA-space candidate generation: top-C by cosine in d dims,
    //     then exact re-rank of those C in 64 dims.
    for (d <- Seq(8, 16, 32); cand <- Seq(20, 50)) {
      val model = Pca.fit(emb, "embedding", d)
      val varKept = model.eigenvalues.sum
      val projected = Pca.project(emb, "vec_id", "embedding", model, scale = 9)
        .withColumn("pvec", array((1 to d).map(i => col(s"pc$i")): _*))
        .select("vec_id", "pvec").cache()
      projected.count()
      val recalls = queries.map { case (qid, q) =>
        val qp = Pca.project(
          Seq((0L, q)).toDF("vec_id", "embedding"), "vec_id", "embedding",
          model, scale = 9).head
        val qpv = (1 to d).map(qp.getDouble).toArray
        // cosine in PCA space via a dot/norm expression over array<double>
        val dot = (0 until d).map(i => col("pvec")(i) * qpv(i)).reduce(_ + _)
        val nrm = sqrt((0 until d).map(i => col("pvec")(i) * col("pvec")(i)).reduce(_ + _))
        val qn = math.sqrt(qpv.map(x => x * x).sum)
        val candidates = projected
          .select(col("vec_id"), (dot / (nrm * qn)).as("s"))
          .orderBy(col("s").desc_nulls_last, col("vec_id")).limit(cand)
          .collect().map(_.getLong(0)).toSet
        (truth(qid) & candidates).size.toDouble / k
      }
      val mean = recalls.sum / recalls.length
      println(f"[pca-ann-probe] pca d=$d%2d cand=$cand%3d varKept=$varKept%8.3f " +
        f"recall@$k=$mean%.3f")
      projected.unpersist()
    }

    // --- Sign-sketch Hamming candidates at several budgets.
    for (cand <- Seq(16, 32, 64, 128)) {
      val recalls = queries.map { case (qid, q) =>
        val got = BitSketchAnn.topK(emb, "vec_id", "embedding", q, k = k,
          candidates = cand).collect().map(_.getLong(0)).toSet
        (truth(qid) & got).size.toDouble / k
      }
      val mean = recalls.sum / recalls.length
      println(f"[pca-ann-probe] bitsketch cand=$cand%3d recall@$k=$mean%.3f")
    }

    spark.stop()
  }
}
