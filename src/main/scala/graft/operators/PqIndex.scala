package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the compressed-vector layer of a
 * billion-scale ANN index (public design: Jégou et al., "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011).
 *
 * Why it matters at 100 TB: raw float32 embeddings cost 4·dim bytes
 * per row (257 B at dim 64 in the reference wire format); PQ stores m
 * one-byte centroid indices (8 B at m=8) — a 32× reduction of what the
 * scan, the shuffle, and the page cache must move. Search uses
 * asymmetric distance (ADC): ONE m×k lookup table is built per query
 * from the full-precision query vector, and scoring a stored row is m
 * byte-indexed lookups — no float vector is ever touched at scan time.
 *
 * Scale shape:
 *  - '''train''': m independent MLlib KMeans fits, one per subspace
 *    (distributed Lloyd iterations; only m·k·dsub floats — the
 *    codebook — ever reach the driver).
 *  - '''encode''': one codegen'd projection per row
 *    ([[graft.functions.VectorKernels.pqEncode]]); the codebook rides
 *    into the plan as a literal (m·k·dsub floats ≈ tens of KB).
 *  - '''search''': scan codes → ADC score (codegen'd lookups) →
 *    `TakeOrderedAndProject`. Compose with [[IvfIndex]] cluster
 *    pruning for the full IVF-PQ shape: prune partitions first, ADC-
 *    scan only the surviving clusters, then exact re-rank the top
 *    candidates from the full-precision vectors (bounded: candidates
 *    only).
 */
object PqIndex {

  /** Trained codebook: flattened [subspace][centroid][component]. */
  final case class PqModel(m: Int, k: Int, dim: Int, codebook: Array[Float]) {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    def dsub: Int = dim / m
    /** Stored bytes per vector: m codes vs 4·dim+1 wire-format floats. */
    def compressionRatio: Double = (4.0 * dim + 1) / m
  }

  /**
   * Train one KMeans codebook per subspace. Each fit sees only the
   * dim/m-component slice of every vector; `seed` makes the codebook —
   * and therefore every code — deterministic.
   */
  def train(emb: DataFrame, vecCol: String, m: Int, k: Int, seed: Long = 42L): PqModel = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val codebook = new Array[Float](m * k * dsub)
    (0 until m).foreach { j =>
      val sub = emb.select(
        array_to_vector(slice(col(vecCol), j * dsub + 1, dsub)).as("features"))
      val model = new KMeans().setK(k).setSeed(seed + j).setFeaturesCol("features")
        .fit(sub)
      model.clusterCenters.zipWithIndex.foreach { case (c: Vector, cent: Int) =>
        var t = 0
        while (t < dsub) {
          codebook((j * k + cent) * dsub + t) = c(t).toFloat
          t += 1
        }
      }
    }
    PqModel(m, k, dim, codebook)
  }

  /** Codebook as a plan literal for the codegen'd encode expression. */
  private def codebookLit(model: PqModel): Column = typedLit(model.codebook.toSeq)

  /** Encode the vector column to m-byte PQ codes (adds `codes`). */
  def encode(emb: DataFrame, vecCol: String, model: PqModel): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.withColumn("codes",
      GraftFunctions.pqEncode(col(vecCol), codebookLit(model), model.m, model.k))
  }

  /** Per-query ADC lookup table: lut[j·k + c] = ‖q_j − centroid_{j,c}‖²
    * — m·k doubles, computed once on the driver (O(k·dim) work). */
  def adcLut(model: PqModel, query: Array[Float]): Array[Double] = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    val lut = new Array[Double](model.m * model.k)
    var j = 0
    while (j < model.m) {
      var cent = 0
      while (cent < model.k) {
        var d = 0.0
        var t = 0
        val off = (j * model.k + cent) * model.dsub
        while (t < model.dsub) {
          val diff = query(j * model.dsub + t).toDouble - model.codebook(off + t).toDouble
          d += diff * diff
          t += 1
        }
        lut(j * model.k + cent) = d
        cent += 1
      }
      j += 1
    }
    lut
  }

  /**
   * ADC top-k over an encoded relation: score = approximate squared L2
   * distance, ascending. The scan touches only the m-byte `codes`
   * column.
   */
  def search(encoded: DataFrame, idCol: String, model: PqModel,
      query: Array[Float], k: Int,
      scoreScale: Option[Int] = None): DataFrame = {
    GraftFunctions.register(encoded.sparkSession)
    val adc = GraftFunctions.pqAdcScore(col("codes"),
      typedLit(adcLut(model, query).toSeq), model.k)
    // round-THEN-order when a scale is given (the driver-row
    // determinism convention: the oracle replays the same rounding, so
    // cut-boundary ties resolve identically on both engines)
    encoded.select(col(idCol),
        scoreScale.map(sc => round(adc, sc)).getOrElse(adc).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /**
   * IVF-PQ: the composed billion-scale search shape. The IVF model
   * prunes to the `searchTopSize` clusters nearest the query (a
   * partition-pruning filter when the store is written
   * `partitionBy(cluster_id)` — file-listing-time pruning, see
   * [[IvfIndex.writePartitioned]]); the ADC scan then touches only the
   * surviving clusters' m-byte codes; finally the top `candidates`
   * re-rank exactly from full-precision vectors. Work per query:
   * |pruned fraction| × m lookups + `candidates` exact distances.
   */
  def ivfPqSearch(
      encodedAssigned: DataFrame, ivf: IvfIndex.IvfModel, pq: PqModel,
      idCol: String, vecCol: String, query: Array[Float],
      k: Int, searchTopSize: Int, candidates: Int,
      scoreScale: Option[Int] = None): DataFrame = {
    val top = ivf.rankClusters(query, SearchStrategy.EuclideanDistance)
      .take(searchTopSize).toSeq
    val pruned = encodedAssigned.filter(col("cluster_id").isin(top: _*))
    searchRerank(pruned, idCol, vecCol, pq, query, k, candidates, scoreScale)
  }

  /**
   * IVF-PQ with tombstones — the [[IvfIndex.searchWithTombstones]]
   * deletion discipline applied to the composed shape: cluster
   * pruning first, then the broadcast LEFT ANTI join drops deleted
   * ids BEFORE the ADC scan (a dead row must not consume a candidate
   * slot — resurrection aside, it would displace a live candidate and
   * silently lower recall), then ADC + exact re-rank over live rows
   * only. Full breadth + a sufficient candidate budget ≡ brute force
   * over the live rows, which is what the churn property in
   * `PqIndexSpec` pins under random append/delete/compact sequences.
   */
  def ivfPqSearchWithTombstones(
      encodedAssigned: DataFrame, ivf: IvfIndex.IvfModel, pq: PqModel,
      idCol: String, vecCol: String, query: Array[Float],
      k: Int, searchTopSize: Int, candidates: Int,
      tombstones: DataFrame, scoreScale: Option[Int] = None): DataFrame = {
    val top = ivf.rankClusters(query, SearchStrategy.EuclideanDistance)
      .take(searchTopSize).toSeq
    val pruned = encodedAssigned
      .filter(col(IvfIndex.ClusterCol).isin(top: _*))
      .join(broadcast(tombstones.select(col(idCol))), Seq(idCol), "left_anti")
    searchRerank(pruned, idCol, vecCol, pq, query, k, candidates, scoreScale)
  }

  /**
   * ADC candidates + exact re-rank: ADC selects `candidates` rows from
   * the codes scan; only those join back to full-precision vectors for
   * the exact distance — the standard accuracy recovery, bounded to the
   * candidate set.
   */
  def searchRerank(encoded: DataFrame, idCol: String, vecCol: String,
      model: PqModel, query: Array[Float], k: Int, candidates: Int,
      scoreScale: Option[Int] = None): DataFrame = {
    val cand = search(encoded, idCol, model, query, candidates, scoreScale)
      .select(idCol)
    val dist = GraftFunctions.knnEuclideanDistance(col(vecCol),
      typedLit(query.toSeq))
    encoded.join(broadcast(cand), idCol)
      .select(col(idCol),
        scoreScale.map(sc => round(dist, sc)).getOrElse(dist).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
