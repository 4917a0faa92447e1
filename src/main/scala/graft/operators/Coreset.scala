package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Greedy k-center coreset selection over an embedding column — the
 * "pick k maximally diverse exemplars" primitive of data selection:
 * active-learning coresets (Sener & Savarese, ICLR 2018 frame coreset
 * selection exactly as k-center), diverse few-shot exemplar picking,
 * and seed selection for clustering (the farthest-point traversal is
 * the classic 2-approximation to the k-center objective,
 * Gonzalez 1985). Where [[KMeansExact]] summarizes MASS, k-center
 * covers EXTENT — it finds the corners of the embedding space, which
 * is what a "what kinds of data do I have" audit wants.
 *
 * DETERMINISTIC + cross-engine exact: similarity is the same
 * `floor(cos·10⁶ + 0.5)` micro grid the LSH/bitext operators pin, the
 * first center is the least id, and every later pick is
 * `argmin (max-similarity-to-selected, id)` — a total order, so the
 * selection is bitwise reproducible and the SQL oracle replays it
 * round by round.
 *
 * Shape at 100 TB: the classic incremental farthest-point recurrence
 * — each round updates every point's best-similarity against ONLY the
 * newly selected center (a 1-row broadcast), then takes one
 * TakeOrdered(1). k scans, k 1-row collects (the same bounded
 * model-boundary driver state as the k-means fit loop); nothing
 * corpus-sized ever shuffles, and lineage is truncated per round.
 *
 * Output: (rank, vec_id, radius_micro) per selected center, where
 * radius_micro is the point's similarity to the nearest
 * PREVIOUSLY-selected center at selection time — the k-center
 * coverage curve (how much less diverse each additional pick is).
 * Rank 1 has no previous centers; its radius is pinned to −10⁶ (the
 * cosine floor) rather than a NULL.
 */
object Coreset {

  def kCenterSeeds(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    var state = vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("maxsim", lit(-2000000L)) // below the cosine floor
      .localCheckpoint(true)
    val picked = Seq.newBuilder[(Int, Long, Long)]
    var r = 1
    while (r <= k && !state.isEmpty) {
      val pick =
        if (r == 1) state.orderBy("id").limit(1).head()
        else state.orderBy("maxsim", "id").limit(1).head()
      val id = pick.getLong(0)
      val radius = if (r == 1) -1000000L else pick.getLong(2)
      picked += ((r, id, radius))
      val center = state.filter(col("id") === id).select(col("v").as("cv"))
      state = state.filter(col("id") =!= id)
        .crossJoin(broadcast(center))
        .withColumn("maxsim", greatest(col("maxsim"),
          floor(graft.functions.GraftFunctions.knnCosineSimilarity(
            col("v"), col("cv")) * lit(1000000.0) + lit(0.5))
            .cast("long")))
        .drop("cv")
        .localCheckpoint(true)
      r += 1
    }
    picked.result().toDF("rank", "vec_id", "radius_micro")
      .select(col("rank").cast("long").as("rank"), col("vec_id"),
        col("radius_micro"))
  }
}
