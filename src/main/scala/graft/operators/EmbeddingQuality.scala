package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-space quality screening — beyond-reference scope (the
 * reference stores embeddings but never audits them, SURVEY.md §2.2).
 * A corpus's embedding table accumulates junk the text filters can't
 * see: encoder failures (near-zero or exploded vectors), mislabeled
 * rows far from their class, collapsed batches. The standard screen is
 * distance-to-centroid z-scoring per group (SemDeDup prunes the same
 * geometry from the other end — this flags the far tail instead of the
 * dense core).
 *
 * Scale shape: three scan-local passes over the vector column, and no
 * shuffle ever carries a vector. Pass 1 builds per-group centroids
 * with the `vector_avg` TypedImperativeAggregate (map-side partial
 * buffers of dim doubles; the result relation is |groups| × dim — the
 * broadcast side). Pass 2 computes each row's distance with the
 * codegen'd euclidean kernel against its broadcast centroid and
 * reduces to per-group moment statistics (map-side partials over the
 * slim (group, dist) projection). Pass 3 recomputes the distance and
 * applies the broadcast z-filter — recomputation is deliberate: the
 * distance subtree is scan + broadcast join with NO exchange, so
 * there is nothing for ReuseExchange to share, and materializing
 * corpus-sized distances (cache or an artificial shuffle) costs more
 * than one extra scan of a columnar store that prunes to
 * (id, group, vector). Calibration-then-filter operators are
 * inherently ≥ 2 passes — the thresholds must exist before any row
 * can be judged.
 *
 * Determinism (the oracle recomputes everything in DuckDB): centroids
 * and distances are rounded to `scale` decimals, and the moment sums
 * accumulate those rounded values EXACTLY in DECIMAL (addition order
 * cannot perturb them); mean/std/z then derive bitwise-identically in
 * any engine.
 */
object EmbeddingQuality {

  /**
   * Rows whose distance to their group centroid has z-score ≥
   * `zThreshold`. Output: (id, group, dist, z), one row per flagged
   * vector. Groups with zero distance spread (e.g. a group of identical
   * vectors) flag nothing.
   */
  def outliers(
      vecs: DataFrame, idCol: String, vecCol: String, groupCol: String,
      zThreshold: Double = 2.0, scale: Int = 6): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    // |groups| × dim relation; element-wise round for determinism (the
    // transform HOF is interpreted, but it runs on |groups| rows only).
    // The rounded centroid is stored as float32 — the distance kernels'
    // vector type — and the oracle applies the same float cast, so both
    // engines subtract bit-identical centroid elements.
    val cents = vecs.groupBy(col(groupCol))
      .agg(GraftFunctions.vectorAvg(col(vecCol)).as("__c"))
      .select(col(groupCol),
        transform(col("__c"), x => round(x, scale).cast("float")).as("__c"))
    val dists = vecs.join(broadcast(cents), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(GraftFunctions.knnEuclideanDistance(col(vecCol), col("__c")), scale)
          .as("dist"))
    val d = col("dist").cast("decimal(18,6)")
    val stats = dists.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(d).as("__sd"), sum(d * d).as("__sd2"))
    val mean = col("__sd").cast("double") / col("__n")
    val variance = col("__sd2").cast("double") / col("__n") - mean * mean
    dists.join(broadcast(stats), Seq(groupCol))
      .withColumn("z",
        when(variance <= 0.0, 0.0)
          .otherwise(round((col("dist") - mean) / sqrt(variance), scale)))
      .filter(col("z") >= zThreshold)
      .select(col(idCol), col(groupCol), col("dist"), col("z"))
  }
}
