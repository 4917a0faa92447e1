package graft.operators

import graft.SparkFunSuite

/** Sinkhorn transport drift: geometry-awareness (near shifts cost
  * less than far shifts — the property JS cannot have), the printed
  * marginal-violation bound, agreement with a floating-point Sinkhorn
  * reference, and determinism. */
class OptimalTransportSpec extends SparkFunSuite {
  import spark.implicits._

  /** Line model: 8 clusters at x = 0..7 (µ-scaled), dim 2. */
  private val lineModel = KMeansExact.Model(
    Array.tabulate(8)(i => Array(i.toLong * 1000000L, 0L)))

  /** n vectors pinned at cluster `c`'s centroid, ids from `base`. */
  private def at(c: Int, n: Int, base: Long): Seq[(Long, Seq[Float])] =
    (0 until n).map(i => (base + i, Seq(c.toFloat, 0f)))

  private def drift(
      a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])]) = {
    val vecs = (a ++ b).toDF("vec_id", "embedding")
    val labels = (a.map(_._1 -> true) ++ b.map(_._1 -> false))
      .toDF("doc_id", "ga")
    OptimalTransport.sinkhornDrift(vecs.repartition(3), "vec_id",
      "embedding", labels, "doc_id", "ga", lineModel).collect().head
  }

  test("geometry: a one-cluster shift costs less than a cross-space shift") {
    val a = at(0, 40, 0L)
    val near = drift(a, at(1, 40, 1000L))
    val far = drift(a, at(7, 40, 1000L))
    assert(near.getLong(0) === 40L && near.getLong(1) === 40L)
    assert(near.getLong(2) < far.getLong(2),
      s"near=${near.getLong(2)} far=${far.getLong(2)}")
    // far shift moves all mass across the normalized grid: cost well
    // above half the scale; near shift is a small fraction
    assert(far.getLong(2) > 500000L)
    assert(near.getLong(2) < far.getLong(2) / 5)
  }

  test("identical slices: cost is the kernel's entropic floor, near zero") {
    val cost = drift(at(2, 50, 0L) ++ at(5, 30, 100L),
      at(2, 50, 1000L) ++ at(5, 30, 1100L)).getLong(2)
    val shifted = drift(at(2, 50, 0L) ++ at(5, 30, 100L),
      at(3, 50, 1000L) ++ at(6, 30, 1100L)).getLong(2)
    assert(cost < shifted, s"identical=$cost shifted=$shifted")
  }

  test("marginal violation stays within tens of micro at 10 rounds") {
    val r = drift(at(0, 25, 0L) ++ at(3, 75, 100L),
      at(1, 60, 1000L) ++ at(6, 40, 1100L))
    assert(r.getLong(3) < 100L, s"marg_err ${r.getLong(3)}")
  }

  test("agreement with a floating-point Sinkhorn reference") {
    // same kernel, same smoothing, float arithmetic — the integer
    // pipeline should land within ~1e-3 of the real scaling limit
    val aCnt = Array(25, 0, 0, 75, 0, 0, 0, 0)
    val bCnt = Array(0, 60, 0, 0, 0, 0, 40, 0)
    val k = 8
    val r = aCnt.map(c => (c + 1).toDouble / (aCnt.sum + k))
    val c = bCnt.map(x => (x + 1).toDouble / (bCnt.sum + k))
    val cost = Array.tabulate(k, k)((i, j) => math.pow((i - j) * 1e6, 2))
    val cmax = cost.flatten.max
    val cn = cost.map(_.map(_ / cmax))
    val ker = cn.map(_.map(x => 1.0 / (1.0 + 10.0 * x)))
    var u = Array.fill(k)(1.0); var v = Array.fill(k)(1.0)
    (1 to 50).foreach { _ =>
      u = Array.tabulate(k)(i =>
        r(i) / (0 until k).map(j => ker(i)(j) * v(j)).sum)
      v = Array.tabulate(k)(j =>
        c(j) / (0 until k).map(i => ker(i)(j) * u(i)).sum)
    }
    val p = Array.tabulate(k, k)((i, j) => u(i) * ker(i)(j) * v(j))
    val tp = p.flatten.sum
    val want = (for (i <- 0 until k; j <- 0 until k)
      yield p(i)(j) / tp * cn(i)(j)).sum
    val got = drift(at(0, 25, 0L) ++ at(3, 75, 100L),
      at(1, 60, 1000L) ++ at(6, 40, 1100L)).getLong(2) / 1e6
    assert(math.abs(got - want) < 2e-3, s"got $got want $want")
  }

  test("property: random marginals — marginal violation bounded, objective on the grid") {
    // Randomized honesty bound (r14 verdict task 7): for random slice
    // compositions over the centroid grid — skewed, sparse, empty
    // clusters included — 10 Sinkhorn rounds must keep the printed
    // marginal violation small (the card's approximation-error
    // column) and the objective inside the normalized [0, 1e6] grid.
    // The kernel's max/min ratio is 11 by construction (k = 1e12 div
    // (1e6 + 10·cost_norm)), so convergence is fast regardless of the
    // marginals; the bound here is ~5% of the µ grid, an order above
    // anything observed (max seen over seeds: double-digit µ).
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      def slice(base: Long): Seq[(Long, Seq[Float])] = {
        val present = (0 until 8).filter(_ => rnd.nextDouble() < 0.6)
        val clusters = if (present.isEmpty) Seq(rnd.nextInt(8)) else present
        clusters.zipWithIndex.flatMap { case (c, i) =>
          at(c, 1 + rnd.nextInt(80), base + i * 100L)
        }
      }
      val r = drift(slice(0L), slice(10000L))
      assert(r.getLong(3) < 500L, s"trial $trial marg_err ${r.getLong(3)}")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L,
        s"trial $trial cost ${r.getLong(2)} off the grid")
    }
  }

  test("property: cost is monotone in the mass shifted across the space") {
    // Mass-shift monotonicity (r14 verdict task 7): A stays at
    // cluster 0; B moves a growing share of its 100 units from
    // cluster 0 to the far end of the line. More moved mass ⇒ a
    // larger transport objective, strictly so across the 0 → 80%
    // span (per-step ties are tolerated only to the extent of the
    // integer grid's truncation, and none occur at these step sizes).
    val costs = Seq(0, 10, 20, 40, 80).map { moved =>
      drift(at(0, 100, 0L),
        at(0, 100 - moved, 1000L) ++ at(7, moved, 2000L)).getLong(2)
    }
    assert(costs === costs.sorted, s"not monotone: $costs")
    costs.zip(costs.tail).foreach { case (lo, hi) =>
      assert(hi > lo, s"no strict increase: $costs")
    }
  }

  test("deterministic under repartitioning; fixture row shape") {
    val a = at(1, 20, 0L) ++ at(4, 20, 50L)
    val b = at(2, 20, 1000L) ++ at(6, 20, 1050L)
    val r1 = drift(a, b)
    val r2 = drift(a, b)
    assert(r1.toSeq === r2.toSeq)
  }
}
