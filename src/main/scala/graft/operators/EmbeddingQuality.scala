package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-space quality screening — beyond-reference scope (the
 * reference stores embeddings but never audits them, SURVEY.md §2.2).
 * A corpus's embedding table accumulates junk the text filters can't
 * see: encoder failures (near-zero or exploded vectors), mislabeled
 * rows far from their class, collapsed batches. The standard screen is
 * distance-to-centroid z-scoring per group (SemDeDup prunes the same
 * geometry from the other end — this flags the far tail instead of the
 * dense core).
 *
 * Scale shape: three scan-local passes over the vector column, and no
 * shuffle ever carries a vector. Pass 1 builds per-group centroids
 * with the `vector_avg` TypedImperativeAggregate (map-side partial
 * buffers of dim doubles; the result relation is |groups| × dim — the
 * broadcast side). Pass 2 computes each row's distance with the
 * codegen'd euclidean kernel against its broadcast centroid and
 * reduces to per-group moment statistics (map-side partials over the
 * slim (group, dist) projection). Pass 3 recomputes the distance and
 * applies the broadcast z-filter — recomputation is deliberate: the
 * distance subtree is scan + broadcast join with NO exchange, so
 * there is nothing for ReuseExchange to share, and materializing
 * corpus-sized distances (cache or an artificial shuffle) costs more
 * than one extra scan of a columnar store that prunes to
 * (id, group, vector). Calibration-then-filter operators are
 * inherently ≥ 2 passes — the thresholds must exist before any row
 * can be judged.
 *
 * Determinism (the oracle recomputes everything in DuckDB): centroids
 * and distances are rounded to `scale` decimals, and the moment sums
 * accumulate those rounded values EXACTLY in DECIMAL (addition order
 * cannot perturb them); mean/std/z then derive bitwise-identically in
 * any engine.
 */
object EmbeddingQuality {

  /**
   * Rows whose distance to their group centroid has z-score ≥
   * `zThreshold`. Output: (id, group, dist, z), one row per flagged
   * vector. Groups with zero distance spread (e.g. a group of identical
   * vectors) flag nothing.
   */
  def outliers(
      vecs: DataFrame, idCol: String, vecCol: String, groupCol: String,
      zThreshold: Double = 2.0, scale: Int = 6): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    // |groups| × dim relation; element-wise round for determinism (the
    // transform HOF is interpreted, but it runs on |groups| rows only).
    // The rounded centroid is stored as float32 — the distance kernels'
    // vector type — and the oracle applies the same float cast, so both
    // engines subtract bit-identical centroid elements.
    val cents = vecs.groupBy(col(groupCol))
      .agg(GraftFunctions.vectorAvg(col(vecCol)).as("__c"))
      .select(col(groupCol),
        transform(col("__c"), x => round(x, scale).cast("float")).as("__c"))
    val dists = vecs.join(broadcast(cents), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(GraftFunctions.knnEuclideanDistance(col(vecCol), col("__c")), scale)
          .as("dist"))
    val d = col("dist").cast("decimal(18,6)")
    val stats = dists.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(d).as("__sd"), sum(d * d).as("__sd2"))
    val mean = col("__sd").cast("double") / col("__n")
    val variance = col("__sd2").cast("double") / col("__n") - mean * mean
    dists.join(broadcast(stats), Seq(groupCol))
      .withColumn("z",
        when(variance <= 0.0, 0.0)
          .otherwise(round((col("dist") - mean) / sqrt(variance), scale)))
      .filter(col("z") >= zThreshold)
      .select(col(idCol), col(groupCol), col("dist"), col("z"))
  }

  /**
   * Per-dimension profile card: (dim, n, mean_micro, min_micro,
   * max_micro, var_micro2) over the µ-quantized vector column — the
   * drift monitor an embedding pipeline checks between encoder
   * versions or corpus snapshots (a shifted per-dim mean or collapsed
   * variance is the first symptom of an encoder regression, before
   * any downstream metric moves).
   *
   * Exactness: values quantize to µ-integers at the scan
   * (`floor(v·1e6 + 0.5)`, the [[KMeansExact]] convention), all sums
   * accumulate in DECIMAL(38) (exact under any partitioning, safe past
   * 2⁶³ where BIGINT sums of v² would wrap at ~10⁹ rows), and the
   * variance derives by INTEGER division of the exact numerator:
   * var = (n·Σv² − (Σv)²) div n² — no float accumulation anywhere, so
   * the card is bit-reproducible and engine-portable. The mean's one
   * double division matches the kmeans mean convention. Output is
   * dim rows: ONE aggregate with map-side partials; nothing else
   * shuffles.
   */
  def dimProfile(vecs: DataFrame, vecCol: String): DataFrame = {
    val q = vecs.select(posexplode(
        transform(col(vecCol),
          v => floor(v.cast("double") * lit(1000000.0) + lit(0.5))))
      .as(Seq("dim", "v")))
    q.groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,0)")).as("__s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("__s2"),
        min(col("v")).as("min_micro"),
        max(col("v")).as("max_micro"))
      .select(
        col("dim").cast("long").as("dim"),
        col("n"),
        floor(col("__s").cast("double") / col("n") + lit(0.5))
          .cast("long").as("mean_micro"),
        col("min_micro"), col("max_micro"),
        // SQL `div` (integral divide) over DECIMAL(38) operands: the
        // numerator is exact and ≥ 0, and both n-factors are decimal
        // so n² cannot wrap BIGINT at extreme row counts
        expr("(CAST(n AS DECIMAL(38,0)) * __s2 - __s * __s) div " +
          "(CAST(n AS DECIMAL(38,0)) * n)").cast("long").as("var_micro2"))
  }

  /**
   * Per-source embedding-distribution divergence — the MAUVE-shaped
   * check discretized onto the exact k-means clusters: each source's
   * cluster histogram P_s against the corpus histogram Q, scored by
   * Jensen–Shannon divergence (symmetric, bounded by ln 2). A source
   * whose embeddings occupy different clusters than the corpus at
   * large is distributionally off — encoder drift, a scraper gone
   * wrong, or genuinely novel content worth upweighting.
   *
   * Exactness: with m = (P+Q)/2, every log argument is a ratio of
   * exact integer products — p/m = 2aB/(aB+bA), q/m = 2bA/(aB+bA) —
   * so each cluster's log is one double op rounded to an integer
   * micro, the weighted sums are exact BIGINTs, and JS·10⁶ =
   * ⌊Σa·L₁/(2A)⌋ + ⌊Σb·L₂/(2B)⌋ (numerators clamped at 0: the KL
   * halves are mathematically ≥ 0, so a micro-rounding dip below
   * zero is noise, and clamping keeps truncating and flooring
   * division identical).
   *
   * Shape: one assignment pass (codegen nearest-centroid against the
   * broadcast codebook), one (source, cluster) aggregate, and the
   * divergence arithmetic on the |sources|·k grid.
   */
  def sourceJsDivergence(
      vecs: DataFrame, idCol: String, vecCol: String,
      docs: DataFrame, docIdCol: String, sourceCol: String,
      model: KMeansExact.Model): DataFrame = {
    val asg = KMeansExact.assign(vecs, idCol, vecCol, model)
      .select(col(idCol), col("cluster"))
    val j = asg.join(docs.select(col(docIdCol), col(sourceCol).as("source")),
      col(idCol) === col(docIdCol))
    val a = j.groupBy(col("source"), col("cluster"))
      .agg(count(lit(1)).as("a"))
    val b = j.groupBy(col("cluster")).agg(count(lit(1)).as("b"))
    val bTot = b.agg(sum("b").as("btot"))
    val grid = a.select("source").distinct()
      .crossJoin(broadcast(b))
      .join(a, Seq("source", "cluster"), "left")
      .na.fill(0L, Seq("a"))
    val aTot = a.groupBy("source").agg(sum("a").as("atot"))
    // count×count products go through DECIMAL(38,0) (the file's decimal
    // discipline): a LongType product overflows once cluster counts pass
    // ~3e9, silently corrupting the log arguments at the scale this
    // operator is for. The decimal is exact; the one double cast happens
    // on the ratio's operands, after the exact products.
    def dprod(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (x.cast("decimal(38,0)") * y.cast("decimal(38,0)")).cast("double")
    val denom = dprod(col("a"), col("btot")) + dprod(col("b"), col("atot"))
    grid.join(broadcast(aTot), "source").crossJoin(broadcast(bTot))
      .select(col("source"), col("atot"), col("btot"),
        when(col("a") > 0,
          col("a") * round(log(
            (lit(2.0) * dprod(col("a"), col("btot"))) / denom)
            * lit(1e6)).cast("long")).otherwise(0L).as("t1"),
        (col("b") * round(log(
          (lit(2.0) * dprod(col("b"), col("atot"))) / denom)
          * lit(1e6)).cast("long")).as("t2"))
      .groupBy(col("source"), col("atot"), col("btot"))
      .agg(sum("t1").as("s1"), sum("t2").as("s2"))
      .select(col("source"), col("atot").as("n_vecs"),
        (expr("greatest(s1, 0L) div (2 * atot)") +
          expr("greatest(s2, 0L) div (2 * btot)")).as("js_micro"))
      .orderBy("source")
  }
}
