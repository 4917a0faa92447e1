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
      // Min neighbor label per node, then fold in the node's own label.
      val nbrLabels = sym
        .join(labels.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("label"))
      val next = labels.union(nbrLabels)
        .groupBy("u").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("p"), col("n.u") === col("p.u"))
        .filter(col("n.label") =!= col("p.label"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("u").as("id"), col("label").as("component"))
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
