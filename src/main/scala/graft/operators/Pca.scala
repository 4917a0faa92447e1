package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PCA / whitening over an embedding column — the standard
 * dimensionality-reduction step in front of ANN and clustering
 * (beyond-reference scope). Split exactly along the 100 TB seam:
 *
 *  - The ONLY full-corpus pass is the [[graft.functions.GramMatrix]]
 *    aggregate (one 16 KB buffer per task, map-side partials, no row
 *    ever leaves its executor) plus a `vector_avg` for the mean —
 *    both in ONE `agg` call, one job.
 *  - Everything dimension-sized (the 64×64 covariance, the Jacobi
 *    eigensolve, component selection) runs on the driver: O(dim³)
 *    on a dim×dim matrix is microseconds and independent of corpus
 *    size — this is parameter fitting, not data processing.
 *  - Projection is a per-row codegen'd projection again (`zip_with` +
 *    `aggregate` builtins over broadcast literal components): the
 *    mean-shift folds into a per-component scalar offset
 *    (⟨x−μ, c⟩ = ⟨x, c⟩ − ⟨μ, c⟩), so the hot path is d dot products
 *    per row and no subtraction pass.
 */
object Pca {

  /** Fitted model: `components(k)` is the k-th principal axis (unit
    * norm, rows of the projection), `eigenvalues(k)` its variance. */
  case class PcaModel(
      dim: Int,
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /**
   * One-pass corpus moments: (n, mean, second-moment matrix M2) where
   * M2(i)(j) = Σ round(vᵢ·vⱼ, 6) / n. Exact-decimal accumulation —
   * see [[graft.functions.GramMatrix]].
   */
  def moments(emb: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    GraftFunctions.register(emb.sparkSession)
    val row = emb.agg(
      GraftFunctions.vectorGram(col(vecCol)).as("g"),
      call_function("vector_avg", col(vecCol)).as("mu")).head()
    val g = row.getStruct(0)
    val n = g.getLong(0)
    val tri = g.getSeq[Long](1)
    val mean = row.getSeq[Double](1).toArray
    val dim = mean.length
    require(tri.length == dim * (dim + 1) / 2, "gram/mean dimension mismatch")
    val m2 = Array.ofDim[Double](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = tri(k) / 1e6 / n
        m2(i)(j) = v
        m2(j)(i) = v
        k += 1
        j += 1
      }
      i += 1
    }
    (n, mean, m2)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows), sorted by descending
    * eigenvalue. O(dim³) per sweep, driver-side, dim ≤ a few hundred. */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]], sweeps: Int = 32): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    // v starts as identity; accumulates the rotations (columns = eigenvectors)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t0 = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val t = if (t0 == 0.0) 1.0 else t0 // theta == 0 → 45° rotation
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val eigenvalues = order.map(i => a(i)(i)).toArray
    val eigenvectors = order.map(i => Array.tabulate(n)(r => v(r)(i))).toArray
    (eigenvalues, eigenvectors)
  }

  /**
   * Johnson–Lindenstrauss random projection as a data-independent
   * alternative to [[fit]]: a seeded gaussian matrix scaled by 1/√d
   * (distance-preserving in expectation), packaged as a [[PcaModel]]
   * (zero mean, unit "eigenvalues") so [[project]] — and its `mat_vec`
   * kernel — serves both. No corpus pass at all: the right tool when
   * even one Gram aggregate is too much or the data is adversarially
   * non-stationary. Deterministic in (dim, d, seed).
   */
  def randomProjection(dim: Int, d: Int, seed: Long): PcaModel = {
    require(d >= 1 && dim >= 1, s"dim/d must be >= 1, got $dim/$d")
    val scale = 1.0 / math.sqrt(d)
    // gaussian via Box–Muller over splitmix-style hashed indices —
    // the same public recipe as VectorKernels' LSH planes.
    def unit(x0: Long): Double = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      ((x >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    }
    val components = Array.tabulate(d) { k =>
      Array.tabulate(dim) { i =>
        val idx = seed + (k.toLong * dim + i) * 2
        val u1 = unit(idx)
        val u2 = unit(idx + 1)
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2) * scale
      }
    }
    PcaModel(dim, new Array[Double](dim), components, Array.fill(d)(1.0))
  }

  /** Fit top-`d` principal components of the CENTERED data:
    * cov = M2 − μμᵀ, eigensolved on the driver. */
  def fit(emb: DataFrame, vecCol: String, d: Int): PcaModel = {
    val (_, mean, m2) = moments(emb, vecCol)
    val dim = mean.length
    require(d >= 1 && d <= dim, s"d must be in [1, $dim], got $d")
    val cov = Array.tabulate(dim, dim)((i, j) => m2(i)(j) - mean(i) * mean(j))
    val (ev, vecs) = jacobiEigen(cov)
    PcaModel(dim, mean, vecs.take(d), ev.take(d))
  }

  /**
   * Project each row onto the model's components:
   * out(k) = (⟨x, c_k⟩ − ⟨μ, c_k⟩) / (√λ_k if `whiten`). ONE codegen'd
   * `mat_vec` kernel call per row (shared across the output columns by
   * subexpression elimination — NOT `zip_with`/`aggregate`, which are
   * `CodegenFallback`); the components travel as plan literals (dim × d
   * doubles — trivially broadcast with the plan itself). Whitening
   * folds into the SAME literals (component and offset pre-divided), so
   * it costs nothing at run time; near-zero eigenvalues are floored to
   * keep the scale finite on degenerate axes.
   */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, scale: Int = 6, whiten: Boolean = false): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val rows = model.components.zipWithIndex.map { case (c0, k) =>
      if (whiten) {
        val sd = math.sqrt(math.max(model.eigenvalues(k), 1e-12))
        c0.map(_ / sd)
      } else c0
    }
    val offsets = rows.map(c => c.indices.map(i => c(i) * model.mean(i)).sum)
    val proj = call_function("mat_vec", col(vecCol),
      typedLit(rows.flatten.toSeq), typedLit(offsets.toSeq))
    val projCols = rows.indices.map(k =>
      round(element_at(proj, k + 1), scale).as(s"pc${k + 1}"))
    emb.select(col(idCol) +: projCols: _*)
  }
}
