package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Exact, engine-reproducible k-means (Lloyd's) over an embedding
 * column — the clustering primitive behind semantic dedup (SemDeDup
 * clusters before it compares), cluster-balanced data mixing, and IVF
 * coarse quantizers. MLlib's KMeans (used internally by
 * [[IvfIndex]]) accumulates in floating point, so its centroids
 * depend on partition order; this operator instead runs the whole
 * algorithm in MICRO-INTEGER arithmetic (the
 * [[QualityClassifier]] convention):
 *
 *  - vectors quantize once to µ-units: `floor(v·1e6 + 0.5)` as BIGINT
 *    (float32→float64 promotion is exact, so both engines see the same
 *    doubles);
 *  - assignment is exact integer L2² through the codegen
 *    `nearest_centroid` expression, ties to the smaller cluster id;
 *  - the update step sums µ-units as BIGINT (exact under any
 *    partitioning — map-side partials, one shuffle keyed by
 *    (cluster, dim)) and re-quantizes the mean with one correctly-
 *    rounded double division (sums < 2⁵³ up to ~10⁹ members/cluster
 *    at µ-scale; past that the mean is ±1µ — still deterministic,
 *    since the division input is the exact BIGINT sum either way);
 *  - empty clusters keep their previous centroid.
 *
 * Scale shape: per iteration ONE distributed assignment pass (scan-
 * local, WholeStageCodegen) and ONE aggregate whose output is k·dim
 * rows; the driver holds k·dim longs (the model), never data. Init is
 * the first k vectors by id — deterministic and oracle-matchable
 * (k-means++ would need a seeded sampler on both engines for no
 * benefit at fixed iteration count).
 *
 * The driver-row oracle re-runs all [[Iters]] Lloyd's rounds as
 * unrolled SQL CTEs over the same µ-integers and matches assignments,
 * sizes, and every centroid coordinate bit-for-bit.
 */
object KMeansExact {

  /** Clusters — fixed so the generated SQL oracle unrolls identically. */
  val K = 8

  /** Lloyd's iterations (assign → update), then one final assignment. */
  val Iters = 3

  val Micro = 1000000.0

  /** k × dim centroid matrix in µ-units. */
  case class Model(centroids: Array[Array[Long]]) {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
    def flat: Array[Long] = centroids.flatten
  }

  /** µ-quantized copy of the vector column: (id, qv array<bigint>). */
  def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol),
      transform(col(vecCol),
        v => floor(v.cast("double") * lit(Micro) + lit(0.5))).as("qv"))

  /** Train `iters` Lloyd's rounds; distributed passes only, driver
    * state = the k·dim model. */
  def fit(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int = K, iters: Int = Iters): Model = {
    GraftFunctions.register(df.sparkSession)
    val q = quantized(df, idCol, vecCol)
    var cents: Array[Array[Long]] = q.orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    var i = 0
    while (i < iters) {
      val flatLit = lit(cents.flatten)
      val sums = q
        .select(
          GraftFunctions.nearestCentroid(col("qv"), flatLit)(0).as("cluster"),
          col("qv"))
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone)
      sums.foreach { r =>
        val c = r.getLong(0).toInt
        val pos = r.getInt(1)
        val sv = r.getLong(2)
        val n = r.getLong(3)
        next(c)(pos) = math.floor(sv * 1.0 / n + 0.5).toLong
      }
      cents = next
      i += 1
    }
    Model(cents)
  }

  /** Final assignment under a trained model: (id, cluster, dist2). */
  def assign(df: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val flatLit = lit(m.flat)
    quantized(df, idCol, vecCol)
      .select(col(idCol),
        GraftFunctions.nearestCentroid(col("qv"), flatLit).as("res"))
      .select(col(idCol),
        col("res")(0).as("cluster"),
        col("res")(1).as("dist2"))
  }

  /** Model card: one row per (cluster, dim) with the µ-unit coordinate
    * and the cluster's member count under the final assignment —
    * scalar columns only (array cells don't survive the driver's
    * comparator), k·dim rows total. */
  def fitTable(
      df: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sizes: Map[Long, Long] = assign(df, idCol, vecCol, m)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = for {
      c <- 0 until m.k
      j <- 0 until m.dim
    } yield (c.toLong, sizes.getOrElse(c.toLong, 0L), j.toLong, m.centroids(c)(j))
    rows.toDF("cluster", "n_members", "dim", "c_micro")
  }

  /**
   * Centroid-based silhouette card (Rousseeuw 1987, the "simplified
   * silhouette" that replaces all-pairs distances with centroid
   * distances — the only variant that scales): per vector,
   * a = distance to its own centroid, b = distance to the nearest
   * OTHER centroid, s = (b − a)/max(a, b); reported as the per-cluster
   * mean. s near 1 ⇔ tight, well-separated cluster; near 0 ⇔ boundary
   * mush; negative ⇔ likely misassignment — the standard "is k right"
   * read on a trained model.
   *
   * Exactness: squared distances are exact BIGINTs over the µ-grid
   * (the same integer L2 the assignment uses, so the derived argmin
   * ties break identically: (d2, cluster)); each s is two
   * correctly-rounded sqrts and one division rounded to 6 dp, and the
   * cluster means sum those rounded values EXACTLY in DECIMAL.
   *
   * Shape: one scan against the k-row broadcast centroid relation
   * (O(k) work per row), one per-id argmin/min on the slim
   * (id, cluster, d2) relation, one cluster aggregate.
   */
  def silhouette(
      df: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame = {
    // b = nearest OTHER centroid is undefined for k = 1: the inner join
    // below would silently return an empty frame rather than a score.
    require(m.k >= 2, s"silhouette requires a k >= 2 model, got k = ${m.k}")
    val spark = df.sparkSession
    import spark.implicits._
    val cents = m.centroids.zipWithIndex
      .map { case (cv, i) => (i.toLong, cv.toSeq) }.toSeq
      .toDF("cluster", "cv")
    val ad = quantized(df, idCol, vecCol)
      .withColumn("qv2", expr("transform(qv, v -> CAST(v AS BIGINT))"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("cluster"),
        expr("aggregate(zip_with(qv2, cv, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, x) -> acc + x)").as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("d2"), col("cluster"))
    val own = ad.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster"), col("d2").as("d2a"))
    val other = ad
      .join(own.select(col(idCol), col("cluster").as("__oc")), idCol.toString)
      .filter(col("cluster") =!= col("__oc"))
      .groupBy(col(idCol)).agg(min(col("d2")).as("d2b"))
    own.join(other, idCol.toString)
      .select(col("cluster"),
        when(greatest(col("d2a"), col("d2b")) === 0, lit(0.0))
          .otherwise(round(
            (sqrt(col("d2b").cast("double")) - sqrt(col("d2a").cast("double"))) /
              greatest(sqrt(col("d2b").cast("double")),
                sqrt(col("d2a").cast("double"))), 6)).as("s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("s").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("mean_silhouette"))
      .orderBy("cluster")
  }
}
