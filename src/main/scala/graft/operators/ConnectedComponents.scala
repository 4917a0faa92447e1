package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list — the missing step
 * between pairwise near-dup detection (Dedup / SimilarityJoin emit
 * PAIRS) and an actual dedup decision (keep one doc per CLUSTER).
 * Without transitive closure, A~B and B~C with A≁C would keep both A
 * and C's copies of the same boilerplate; components collapse the whole
 * chain to one representative (the minimum id).
 *
 * Algorithm: iterative min-label propagation.
 *   label(v) ← min(label(v), min over neighbors u of label(u))
 * repeated until a fixpoint, which takes at most `diameter` rounds.
 * Near-dup graphs are unions of small dense clusters (diameter ≤ 3-4
 * in practice), so convergence is fast; `maxIters` is a safety bound.
 *
 * Scale design (100 TB): each round is ONE equality join of the edge
 * list with the label table on the neighbor key plus ONE min-aggregate
 * on the node key — both standard shuffles that AQE skew-splits; no
 * all-pairs work, no driver-side graph. The per-round convergence
 * check is an aggregate (count of changed labels), not a data
 * collect. `localCheckpoint` truncates the growing lineage each round
 * (on a real cluster with a fault-tolerance requirement, swap for
 * reliable `checkpoint` on distributed storage). This is the shape
 * GraphX/Pregel uses for CC; for graphs with giant-diameter paths the
 * large-star/small-star variant converges in O(log n) rounds, but a
 * dedup graph never looks like that — and the row-count fixpoint test
 * makes the trade observable, not assumed.
 */
object ConnectedComponents {

  /**
   * @param edges   pair list (one row per undirected edge)
   * @param srcCol  source-id column name
   * @param dstCol  destination-id column name
   * @return (id, component) for every node appearing in `edges`, where
   *         component = minimum id reachable from the node (including
   *         itself) — deterministic regardless of partitioning.
   */
  def components(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    // Symmetrize once; cache — every round re-joins the same edge list.
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("u")).distinct()
      .withColumn("label", col("u"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // Min neighbor label per node, folded with the node's own label.
      // The own label rides through the same aggregate (tagged), so the
      // convergence test (any new < old?) is a filter over the already-
      // checkpointed result — no extra join job per round.
      val own = labels.select(col("u"), col("label"), lit(true).as("own"))
      val nbr = sym
        .join(labels.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("label"), lit(false).as("own"))
      val next = own.union(nbr)
        .groupBy("u")
        .agg(min("label").as("label"),
          min(when(col("own"), col("label"))).as("__old"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("__old")).isEmpty
      labels = next.drop("__old")
      iter += 1
    }
    labels.select(col("u").as("id"), col("label").as("component"))
  }

  /**
   * Alternating-star connected components — the polylog-round variant
   * (public algorithm: Kiveris et al., "Connected Components in
   * MapReduce and Beyond"; alternating large-star/small-star converges
   * in O(log² n) rounds, vs one round per unit of graph DIAMETER for
   * min-label propagation — an adversarial path graph of 10⁶ nodes
   * needs 10⁶ propagation rounds but only ~tens of star rounds, since
   * the star operations flatten trees geometrically on ANY topology).
   *
   *  - large-star(u): every neighbor v > u re-attaches to
   *    m(u) = min(Γ(u) ∪ u)
   *  - small-star(u): every neighbor v ≤ u (and u) re-attaches to m(u)
   *
   * Both are implemented join-free as ONE window-min over the edge
   * list's u-partition followed by a per-row rewrite + distinct — no
   * `collect_list` of neighbor sets, so a hub node with 10⁸ neighbors
   * never materializes a buffer (the known OOM hazard of the naive
   * formulation); AQE splits the hub's shuffle partition instead.
   * Fixpoint = the canonical (child, parent) edge set stops changing;
   * at that point edges ARE the (id, component) map.
   *
   * Same contract as [[components]]: every node of `edges` labeled
   * with its component's minimum id. Cross-checked against
   * [[components]] property-style in the spec.
   */
  def componentsAlternating(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u")

    // large-star: neighbors larger than u hang under m(u) = min(Γ(u) ∪ u)
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      sym.withColumn("m", least(min(col("v")).over(w), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    // small-star: u and its not-larger neighbors hang under m(u)
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      canon.withColumn("m", least(min(col("v")).over(w), col("u")))
        .select(col("u"), col("v"), col("m"))
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var cur = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      // fixpoint test on the canonical edge set: symmetric difference
      // empty (two slim anti joins — aggregates, no data to the driver)
      val gone = cur.except(next).limit(1).count()
      val fresh = next.except(cur).limit(1).count()
      converged = gone == 0 && fresh == 0
      cur = next
      iter += 1
    }
    // At the fixpoint every edge is (node, its component root); roots
    // themselves appear only on the parent side.
    val roots = cur.select(col("v")).except(cur.select(col("u")))
      .select(col("v").as("id"), col("v").as("component"))
    cur.select(col("u").as("id"), col("v").as("component")).union(roots)
  }

  /**
   * Components plus per-cluster size — the ready-to-use dedup verdict:
   * keep the row whose id == component, drop the other n_members - 1.
   */
  def componentSizes(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    components(edges, srcCol, dstCol, maxIters)
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("component")))
  }
}
