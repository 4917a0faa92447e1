package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class PcaSpec extends SparkFunSuite {

  test("jacobiEigen: analytic 2x2 and orthonormal eigenvectors") {
    // [[2,1],[1,2]] → eigenvalues 3, 1; eigenvectors (1,1)/√2, (1,-1)/√2
    val (ev, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    for (v <- vecs) assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-9)  // (1,1) direction
    assert(math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-9)  // (1,-1) direction
    // A v = λ v
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    for (k <- 0 to 1; i <- 0 to 1) {
      val av = a(i)(0) * vecs(k)(0) + a(i)(1) * vecs(k)(1)
      assert(math.abs(av - ev(k) * vecs(k)(i)) < 1e-9)
    }
  }

  test("moments: hand-computed mean and second moment on a toy corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f)),
      (2L, Array(3f, 4f))).toDF("id", "vec")
    val (n, mean, m2) = Pca.moments(df, "vec")
    assert(n === 2L)
    assert(mean(0) === 2.0 && mean(1) === 3.0)
    assert(m2(0)(0) === (1.0 + 9.0) / 2)   // (1² + 3²)/2
    assert(m2(0)(1) === (2.0 + 12.0) / 2)  // (1·2 + 3·4)/2
    assert(m2(1)(0) === m2(0)(1))
    assert(m2(1)(1) === (4.0 + 16.0) / 2)
  }

  test("moments are partition-order independent (micro-unit accumulation)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 200L).map(i => (i, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "vec")
    val (_, _, a) = Pca.moments(df.repartition(1), "vec")
    val (_, _, b) = Pca.moments(df.orderBy(rand(5)).repartition(13), "vec")
    for (i <- 0 until 8; j <- 0 until 8) assert(a(i)(j) === b(i)(j))
  }

  test("fit recovers the dominant axes of planted-variance data") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // variance 9 along axis 0, variance 1 along axis 3, nothing elsewhere
    val rows = (0L until 500L).map { i =>
      val v = new Array[Float](6)
      v(0) = (rng.nextGaussian() * 3).toFloat + 5f // offset tests centering
      v(3) = rng.nextGaussian().toFloat
      (i, v)
    }
    val model = Pca.fit(rows.toDF("id", "vec"), "vec", d = 2)
    assert(model.eigenvalues(0) > 4 * model.eigenvalues(1))
    assert(math.abs(math.abs(model.components(0)(0)) - 1.0) < 0.05) // ≈ ±e0
    assert(math.abs(math.abs(model.components(1)(3)) - 1.0) < 0.05) // ≈ ±e3
  }

  test("project matches a manual centered dot product and is shuffle-free") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(4f, 5f, 6f))).toDF("id", "vec")
    val model = Pca.PcaModel(3,
      mean = Array(2.5, 3.5, 4.5),
      components = Array(Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0)),
      eigenvalues = Array(1.0, 0.5))
    val out = Pca.project(df, "id", "vec", model)
    val got = out.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((-1.5, -1.5)))
    assert(got(2L) === ((1.5, 1.5)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("whiten: planted-variance axes come out with ~unit empirical variance") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0L until 2000L).map { i =>
      val v = new Array[Float](4)
      v(0) = (rng.nextGaussian() * 5).toFloat
      v(1) = (rng.nextGaussian() * 0.5).toFloat
      (i, v)
    }
    val df = rows.toDF("id", "vec")
    val model = Pca.fit(df, "vec", d = 2)
    val projected = Pca.project(df, "id", "vec", model, scale = 9, whiten = true)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val v1 = variance(projected.map(_._1))
    val v2 = variance(projected.map(_._2))
    assert(math.abs(v1 - 1.0) < 0.05, s"pc1 variance $v1")
    assert(math.abs(v2 - 1.0) < 0.05, s"pc2 variance $v2")
  }

  test("randomProjection: JL distance preservation within tolerance on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val rows = (0L until 60L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("id", "vec")
    val model = Pca.randomProjection(dim = 64, d = 32, seed = 7L)
    val proj = Pca.project(df, "id", "vec", model, scale = 9)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getDouble).toArray).toMap
    val byId = rows.toMap
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val ratios = for (i <- 0L until 20L; j <- (i + 1) until 20L) yield {
      val orig = dist(byId(i).map(_.toDouble), byId(j).map(_.toDouble))
      dist(proj(i), proj(j)) / orig
    }
    // JL at d=32: pairwise distances within ±40% with overwhelming
    // probability; the MEAN ratio concentrates near 1.
    assert(ratios.forall(r => r > 0.6 && r < 1.4), s"worst=${ratios.min}/${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.1, s"mean ratio $mean")
  }

  test("randomProjection is deterministic in (dim, d, seed)") {
    val a = Pca.randomProjection(16, 4, 42L)
    val b = Pca.randomProjection(16, 4, 42L)
    val c = Pca.randomProjection(16, 4, 43L)
    assert(a.components.flatten.toSeq === b.components.flatten.toSeq)
    assert(a.components.flatten.toSeq !== c.components.flatten.toSeq)
  }

  test("end to end: projection onto full basis preserves centered norms") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (0L until 100L).map(i => (i, Array.fill(5)(rng.nextFloat())))
    val df = rows.toDF("id", "vec")
    val model = Pca.fit(df, "vec", d = 5)
    val projected = Pca.project(df, "id", "vec", model, scale = 9)
      .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getDouble).toArray).toMap
    val byId = rows.toMap
    for ((id, p) <- projected) {
      val v = byId(id)
      val centered = v.indices.map(i => v(i).toDouble - model.mean(i))
      val n2 = centered.map(x => x * x).sum
      val p2 = p.map(x => x * x).sum
      assert(math.abs(n2 - p2) < 1e-5, s"norm not preserved for $id: $n2 vs $p2")
    }
  }
}
