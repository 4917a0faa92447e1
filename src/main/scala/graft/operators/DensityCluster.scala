package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DBSCAN density clustering (Ester, Kriegel, Sander, Xu, KDD 1996)
 * over micro-quantized integer coordinates — the curation step that
 * k-means cannot do: find clusters of UNKNOWN count and UNKNOWN shape
 * and, critically for a training-data pipeline, a principled NOISE
 * set (points in no dense region) to route to human review or
 * down-weighting. Complements [[KMeansExact]] (fixed k, convex cells)
 * and [[EmbeddingQuality]]'s distance-based outliers.
 *
 * Semantics pinned exactly (every downstream artifact is replayable):
 *  - neighbor:  ‖p−q‖² ≤ eps² in INTEGER micro-units, inclusive,
 *               self included (the original paper's N_eps(p) ∋ p);
 *  - core:      |N_eps(p)| ≥ minPts;
 *  - cluster:   connected component of the core-core eps-graph
 *               ([[ConnectedComponents.components]]), labelled by the
 *               MINIMUM core id in the component — the paper leaves
 *               labels to visit order, which is not reproducible on a
 *               cluster; min-id is partition-invariant;
 *  - border:    non-core with ≥ 1 core neighbor, assigned the MINIMUM
 *               label among its core neighbors' clusters (the paper
 *               assigns first-visitor; same determinism fix);
 *  - noise:     everything else, cluster = −1.
 * All arithmetic is Long (coords are micro-quantized, candidate pairs
 * sit within one cell hop so |Δ| ≤ 2·eps; the squared sum is far from
 * overflow), so the result is BITWISE deterministic under any
 * partitioning, task order, or AQE re-plan.
 *
 * Scale design (100 TB): the ε-neighbor join is GRID-BLOCKED — each
 * point keys to its cell (⌊x/eps⌋, ⌊y/eps⌋) and probes the 3×3 cell
 * neighborhood, which is a SUPERSET of the true eps-ball (if
 * ‖p−q‖ ≤ eps then |p_i − q_i| ≤ eps per axis), so blocking loses
 * nothing and the all-pairs grid never materializes: candidate count
 * is n × (9 × expected cell occupancy), i.e. O(n · density), the
 * MR-DBSCAN shape. Each stage is one equality shuffle on 2-Long cell
 * keys (AQE skew-splits a viral cell); the component step inherits
 * [[ConnectedComponents]]'s scale story. This operator is 2-D BY
 * DESIGN: eps-grid blocking degenerates in high dimensions (an eps
 * ball spans every cell), so reduce embeddings with [[Pca]] (or take
 * the matryoshka prefix, [[VectorCompression]]) before clustering —
 * density clustering in raw 64-d+ space is ill-posed anyway
 * (distance concentration; Beyer et al. 1999).
 */
object DensityCluster {

  /**
   * @param points  one row per point
   * @param idCol   Long id column
   * @param xCol    x coordinate, micro-quantized Long
   * @param yCol    y coordinate, micro-quantized Long
   * @param epsMicro  neighborhood radius in micro-units (> 0)
   * @param minPts  core threshold on |N_eps(p)| with self included (≥ 1)
   * @return (id, cluster, role) for EVERY input point: role ∈
   *         {core, border, noise}; cluster = min core id of the
   *         point's component, or −1 for noise. Ordered by id.
   */
  def dbscan(
      points: DataFrame, idCol: String, xCol: String, yCol: String,
      epsMicro: Long, minPts: Int): DataFrame = {
    require(epsMicro > 0, s"epsMicro must be > 0, got $epsMicro")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val eps = lit(epsMicro)

    val pts = points.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))

    // Floor-division cell key, integer-exact for negative coords
    // (pmod is always non-negative, so (v - pmod) div eps = ⌊v/eps⌋).
    // `div` (IntegralDivide) keeps the join key LongType end to end:
    // Column./ would promote to DOUBLE, whose 2^53 mantissa silently
    // drops neighbor pairs at extreme coordinate/eps ratios.
    def cell(name: String): Column =
      expr(s"($name - pmod($name, ${epsMicro}L)) div ${epsMicro}L")

    val build = pts
      .withColumn("cx", cell("x"))
      .withColumn("cy", cell("y"))
    // Probe side: each point visits its 3×3 cell neighborhood, so a
    // true neighbor pair (a, b) meets on exactly ONE key — a's home
    // cell — and needs no post-join dedup.
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probe = pts
      .withColumn("o", explode(offsets))
      .select(col("id").as("bid"), col("x").as("bx"), col("y").as("by"),
        (cell("x") + col("o.dx")).as("cx"),
        (cell("y") + col("o.dy")).as("cy"))

    // Candidate pairs within one cell hop; exact integer ball test.
    // Self-pairs (dx = dy = 0 cell) ride through — N_eps(p) ∋ p.
    val d2 = (col("x") - col("bx")) * (col("x") - col("bx")) +
      (col("y") - col("by")) * (col("y") - col("by"))
    val pairs = build.join(probe, Seq("cx", "cy"))
      .filter(d2 <= eps * eps)
      .select(col("id"), col("bid"))
      .localCheckpoint(true)

    // Core predicate: neighbor COUNT (self included) ≥ minPts.
    val cores = pairs.groupBy("id").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= lit(minPts.toLong))
      .select("id")
      .localCheckpoint(true)

    // Core-core eps-graph → components → min-core-id labels. A core
    // with no OTHER core neighbor never enters the edge list, so its
    // singleton cluster label coalesces to its own id.
    val coreEdges = pairs
      .join(cores, "id")
      .join(cores.withColumnRenamed("id", "bid"), "bid")
      .filter(col("id") =!= col("bid"))
      .select(col("id").as("src"), col("bid").as("dst"))
    val comps = ConnectedComponents.components(coreEdges, "src", "dst")
    val coreLbl = cores
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster"),
        lit("core").as("role"))
      .localCheckpoint(true)

    // Border: non-core touching ≥ 1 core → min neighbor-cluster label.
    val borderLbl = pairs
      .join(cores.withColumnRenamed("id", "__c"),
        col("id") === col("__c"), "left_anti")
      .join(coreLbl.select(col("id").as("bid"), col("cluster")), "bid")
      .groupBy("id")
      .agg(min("cluster").as("cluster"))
      .withColumn("role", lit("border"))

    // Noise: everything not core and not border.
    val labelled = coreLbl.unionByName(borderLbl)
    val noise = pts.select("id")
      .join(labelled.select("id"), Seq("id"), "left_anti")
      .select(col("id"), lit(-1L).as("cluster"), lit("noise").as("role"))

    labelled.unionByName(noise).orderBy("id")
  }

  /**
   * Per-cluster summary card over [[dbscan]] output: size, core/border
   * split, and the noise row (cluster −1) — the triage view a curator
   * reads before deciding which dense regions to keep.
   */
  def dbscanSummary(labels: DataFrame): DataFrame =
    labels.groupBy("cluster")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"),
        sum(when(col("role") === "border", 1L).otherwise(0L)).as("n_border"))
      .orderBy("cluster")
}
