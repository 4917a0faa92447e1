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

  test("deterministic under repartitioning; fixture row shape") {
    val a = at(1, 20, 0L) ++ at(4, 20, 50L)
    val b = at(2, 20, 1000L) ++ at(6, 20, 1050L)
    val r1 = drift(a, b)
    val r2 = drift(a, b)
    assert(r1.toSeq === r2.toSeq)
  }
}
