package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Entropic-style optimal-transport drift between two corpus slices
 * over the k-means centroid grid — the GEOMETRY-AWARE companion to
 * the cluster-histogram JS divergence: JS scores each cluster's mass
 * difference independently, so mass moving between two NEARBY
 * clusters costs as much as mass teleporting across the space; the
 * transport objective weights every moved unit by how far it moved
 * (Wasserstein-style, here under a Sinkhorn-scaled plan). The card a
 * curator reads when "the mixture shifted" needs a severity, not
 * just a flag.
 *
 * Construction (all exact integer arithmetic, every step replayed by
 * the SQL oracle):
 *  - both slices become add-one-smoothed µ-marginals over the K
 *    clusters of the shared [[KMeansExact]] model (one distributed
 *    assignment pass + one count aggregate — the only corpus-sized
 *    work);
 *  - the K×K cost grid is the exact µ²-integer squared-L2 between
 *    centroids, normalized onto [0, 10⁶] by its max;
 *  - the Gibbs kernel is the RATIONAL kernel k = 10¹² div
 *    (10⁶ + 10·cost_norm) — positive everywhere, monotone in cost.
 *    Sinkhorn's theorem needs only positivity, not exp(−c/ε), and a
 *    division is engine-exact where exp is libm-specific;
 *  - [[Iters]] Sinkhorn scaling rounds run DRIVER-SIDE in BigInt over
 *    the K-vector state (the [[KMeansExact.fit]] driver-state
 *    pattern: k·dim longs, never data), with every division a
 *    truncating positive integer division — so the fixed iteration
 *    sequence is bit-identical in any engine;
 *  - the plan normalizes to µ and reports the transport objective
 *    Σ P̂·cost_norm plus the worst marginal violation (the card's own
 *    honesty metric — Sinkhorn at fixed iterations is approximate,
 *    and the approximation error is PRINTED, not hidden; measured ≤
 *    tens of µ at 10 rounds).
 *
 * Output: one row (n_a, n_b, cost_micro, marg_err_micro).
 */
object OptimalTransport {

  /** Fixed Sinkhorn rounds — fixed so the SQL oracle unrolls
    * identically. */
  val Iters = 10

  private val S6 = BigInt(1000000L)
  private val S12 = BigInt(1000000000000L)

  def sinkhornDrift(
      vecs: DataFrame, idCol: String, vecCol: String,
      labels: DataFrame, labelIdCol: String, flagCol: String,
      model: KMeansExact.Model): DataFrame = {
    val k = model.k
    require(k >= 2, s"model must have >= 2 clusters, got $k")
    val asg = KMeansExact.assign(vecs, idCol, vecCol, model)
      .select(col(idCol), col("cluster"))
    // slice membership is the caller's label relation: vectors with
    // no label row are in NEITHER slice (inner join — n_a + n_b says
    // how much of the corpus the card covers), and a NULL flag is
    // excluded rather than silently bucketed into slice B
    val counts = asg
      .join(labels.filter(col(flagCol).isNotNull)
        .select(col(labelIdCol), col(flagCol).as("__ga")),
        col(idCol) === col(labelIdCol))
      .groupBy("cluster")
      .agg(sum(when(col("__ga"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__ga"), 0L).otherwise(1L)).as("cb"))
      .collect() // bounded: <= k rows, the model-boundary collect
    val ca = Array.fill(k)(0L)
    val cb = Array.fill(k)(0L)
    counts.foreach { r =>
      val c = r.getLong(0).toInt; ca(c) = r.getLong(1); cb(c) = r.getLong(2)
    }
    val nA = ca.sum
    val nB = cb.sum
    // add-one-smoothed µ-marginals
    val sa = BigInt(nA + k)
    val sb = BigInt(nB + k)
    val r = ca.map(c => S6 * (c + 1) / sa)
    val c = cb.map(x => S6 * (x + 1) / sb)
    // exact µ² squared-L2 centroid grid, normalized to [0, 1e6]
    val cost = Array.tabulate(k, k) { (i, j) =>
      var s = BigInt(0)
      var d = 0
      while (d < model.dim) {
        val delta = BigInt(model.centroids(i)(d) - model.centroids(j)(d))
        s += delta * delta
        d += 1
      }
      s
    }
    val cmax = cost.flatten.max
    val cn = cost.map(_.map(x => if (cmax > 0) S6 * x / cmax else BigInt(0)))
    val ker = cn.map(_.map(x => S12 / (S6 + 10 * x)))
    // Sinkhorn scaling, Iters rounds, truncating positive divisions
    var u = Array.fill(k)(S6)
    var v = Array.fill(k)(S6)
    var t = 0
    while (t < Iters) {
      val su = Array.tabulate(k)(i =>
        (0 until k).map(j => ker(i)(j) * v(j)).sum)
      u = Array.tabulate(k)(i => r(i) * S12 / (su(i) / S6).max(1))
      val sv = Array.tabulate(k)(j =>
        (0 until k).map(i => ker(i)(j) * u(i)).sum)
      v = Array.tabulate(k)(j => c(j) * S12 / (sv(j) / S6).max(1))
      t += 1
    }
    val p = Array.tabulate(k, k)((i, j) => u(i) * ker(i)(j) * v(j))
    val tp = p.flatten.sum.max(1)
    val pn = p.map(_.map(x => S6 * x / tp))
    val obj = (for (i <- 0 until k; j <- 0 until k)
      yield pn(i)(j) * cn(i)(j)).sum / S6
    val rm = Array.tabulate(k)(i => (0 until k).map(j => pn(i)(j)).sum)
    val cm = Array.tabulate(k)(j => (0 until k).map(i => pn(i)(j)).sum)
    val err = ((0 until k).map(i => (rm(i) - r(i)).abs) ++
      (0 until k).map(j => (cm(j) - c(j)).abs)).max
    val spark = vecs.sparkSession
    import spark.implicits._
    Seq((nA, nB, obj.toLong, err.toLong))
      .toDF("n_a", "n_b", "cost_micro", "marg_err_micro")
  }
}
