package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch-native NSW (navigable-small-world) graph ANN — the graph-index
 * family (Malkov et al. 2014; the flat ancestor of HNSW) re-expressed
 * for Spark's batch model, beside IVF ([[IvfIndex]]), PQ/ADC
 * ([[PqIndex]]), sign sketches ([[BitSketchAnn]]), PCA ([[PcaAnn]])
 * and SQ8 ([[SqAnn]]). Beyond-reference scope (the reference's only
 * index is the kmeans tree, /root/reference/app.py:186-196).
 *
 * Why this shape: pointer-chasing graph search is the one ANN family
 * that fights Spark's scan-oriented execution — a faithful HNSW visits
 * one node at a time. The batch-native variant keeps the graph's
 * navigability but walks it in BULK: a beam of candidates expands one
 * whole hop per Spark job (score every frontier node in one scan-side
 * pass, fetch every beam neighbor in one adjacency probe), so the hop
 * count — not the visit count — bounds the number of jobs. This is the
 * standard batch adaptation (one-shot NSW over a prebuilt k-NN graph);
 * single-digit hops reach stable top-k on navigable graphs.
 *
 * Build: the adjacency relation IS the [[SimilarityJoin.knnGraph]]
 * output (symmetrized k-NN edges from banded LSH — already bucketed,
 * capped, and driver-verified), plus a deterministic seeded-md5 sample
 * of entry points for global reach on a possibly-disconnected graph.
 *
 * Search (driver-orchestrated beam, all per-iteration relations
 * bounded by beam × degree):
 *   1. score the entry points against the query (one pruned fetch);
 *   2. expand: one equality probe of the adjacency relation on the
 *      current beam's ids → unvisited neighbor ids;
 *   3. score the new ids, merge into the beam (size `beam`, ordered by
 *      rounded score DESC, id ASC), repeat until the beam stops
 *      changing or `maxIters` hops;
 *   4. emit the beam's top k.
 *
 * 100 TB shape: the driver holds only (beam × degree) ids and scores
 * per hop. The two per-hop probes are id-equality filters — against an
 * id-bucketed store and an id-bucketed adjacency relation they are
 * bucket-pruned point lookups, never full scans; the graph build is
 * the banded-LSH join that already carries the repo's bucket caps. The
 * expansion set is exact regardless of layout, so recall depends only
 * on (graph degree, entries, beam, hops) — measured in `NswAnnSpec`'s
 * recall grid, with the shipped driver-row point chosen at full recall
 * (the [[PcaAnn]] discipline, so the row's oracle is brute force).
 */
object NswAnn {

  /** A built graph index: symmetric adjacency (id, nbr_id) + fixed
    * entry points. Adjacency is a DataFrame — at scale it lives as an
    * id-bucketed table beside the store (the `ann_nsw_disk` driver row
    * runs this exact layout via [[BucketedStore]]: adjacency bucketed
    * on `id`, store bucketed on the id column, and `NswAnnSpec`
    * plan-asserts that the per-hop probes bucket-prune to point
    * lookups instead of full scans). */
  final case class Graph(adj: DataFrame, entryIds: Seq[Long])

  /**
   * Build the navigable graph: degree-`degree` symmetrized k-NN
   * adjacency from the banded-LSH graph, and `entries` deterministic
   * entry points (seeded md5 rank over the ids — corpus-size-invariant
   * and spread uniformly, the [[DatasetSplit.balancedSample]]
   * discipline).
   */
  def build(
      emb: DataFrame, idCol: String, vecCol: String,
      degree: Int = 16, entries: Int = 8,
      threshold: Double = 0.0, seed: Long = 42L,
      maxBucket: Option[Int] = None): Graph = {
    require(degree > 0, s"degree must be positive, got $degree")
    require(entries > 0, s"entries must be positive, got $entries")
    val adj = SimilarityJoin.knnGraph(emb, idCol, vecCol, k = degree,
      threshold = threshold, seed = seed, maxBucket = maxBucket)
      .select(col("id"), col("nbr_id"))
    val entryIds = emb
      .select(col(idCol).as("id"),
        md5(concat(lit("nsw:"), col(idCol).cast("string")).cast("binary"))
          .as("__h"))
      .orderBy(col("__h"), col("id"))
      .limit(entries)
      .collect().map(_.getLong(0)).toSeq
    Graph(adj, entryIds)
  }

  /**
   * Batch append — the graph index joins the IVF store's lifecycle
   * (build/append; delete rides the caller's id filter): each new
   * node links bidirectionally to its `degree` nearest neighbors
   * among the UNION of the existing corpus and the batch (the
   * standard incremental-NSW insertion, done in bulk: one banded-LSH
   * knn-between for new→old and one knn-graph for new→new — never a
   * rebuild of the old adjacency). Existing nodes keep their edges
   * and may exceed `degree` as append batches accrue — degree
   * tightening is a compaction concern, exactly like IVF's
   * generational rewrite. Entry points are recomputed with [[build]]'s
   * seeded md5 rank over the union, so append∘append is deterministic
   * and a freshly built graph over the union has the same entries.
   */
  def append(
      graph: Graph, existing: DataFrame, fresh: DataFrame,
      idCol: String, vecCol: String,
      degree: Int = 16, entries: Int = 8,
      threshold: Double = 0.0, seed: Long = 42L,
      maxBucket: Option[Int] = None): Graph = {
    require(degree > 0, s"degree must be positive, got $degree")
    require(entries > 0, s"entries must be positive, got $entries")
    val all = existing.select(col(idCol), col(vecCol))
      .unionByName(fresh.select(col(idCol), col(vecCol)))
    val toOld = SimilarityJoin.knnBetween(fresh, existing, idCol, vecCol,
      k = degree, threshold = threshold, seed = seed, maxBucket = maxBucket)
      .select(col("query_id").as("id"), col("corpus_id").as("nbr_id"))
    val toNew = SimilarityJoin.knnGraph(fresh, idCol, vecCol, k = degree,
      threshold = threshold, seed = seed, maxBucket = maxBucket)
      .select(col("id"), col("nbr_id"))
    val newEdges = toOld.unionByName(toNew)
    // one explode, not unionByName(newEdges, newEdges-reversed): the
    // union form derives both LSH joins once per branch
    val sym = newEdges.select(explode(array(
        struct(col("id"), col("nbr_id")),
        struct(col("nbr_id").as("id"), col("id").as("nbr_id")))).as("__e"))
      .select(col("__e.id").as("id"), col("__e.nbr_id").as("nbr_id"))
    // distinct over the NEW edges only: every sym edge touches at
    // least one new node, so it cannot duplicate an old-adjacency row
    // — deduplicating the union would re-shuffle the whole old graph
    // on every append batch, exactly the rebuild this method avoids
    val adj = graph.adj.unionByName(sym.distinct())
    val entryIds = all
      .select(col(idCol).as("id"),
        md5(concat(lit("nsw:"), col(idCol).cast("string")).cast("binary"))
          .as("__h"))
      .orderBy(col("__h"), col("id"))
      .limit(entries)
      .collect().map(_.getLong(0)).toSeq
    Graph(adj, entryIds)
  }

  /**
   * Tombstone delete + neighbor-reconnecting compaction — the rest of
   * the lifecycle ([[append]]'s scaladoc promise): a deleted node
   * stays ROUTABLE until compaction (the standard graph-index delete:
   * dropping a hub immediately would sever the paths through it) but
   * never appears in results ([[topK]]'s `tombstones`); compaction
   * then removes its edges and RECONNECTS each deleted COMPONENT's
   * live boundary pairwise (per-component, not per-node: adjacent
   * deletions would otherwise sever the paths running through the
   * deleted region — a component's clique is bounded by its live
   * boundary squared), and entry points re-rank over the live ids
   * with [[build]]'s seeded rule. `NswAnnSpec` pins
   * search-after-compaction ≡ tombstone search at the shipped point
   * AND on a constructed live–d1–d2–live bridge.
   */
  def compact(
      live: DataFrame, idCol: String, graph: Graph,
      deleted: DataFrame, delIdCol: String,
      entries: Int = 8): Graph = {
    require(entries > 0, s"entries must be positive, got $entries")
    val del = deleted.select(col(delIdCol).as("__del")).distinct()
    val liveEdges = graph.adj
      .join(del, col("id") === col("__del"), "left_anti")
      .join(del.withColumnRenamed("__del", "__del2"),
        col("nbr_id") === col("__del2"), "left_anti")
    // Repair by deleted COMPONENT, not deleted node: two adjacent
    // deleted nodes would otherwise lose the path THROUGH them (each
    // per-node clique only spans that node's own live boundary, so a
    // live-d1-d2-live bridge fragments). Label the deleted-deleted
    // subgraph with connected components, gather each component's
    // LIVE boundary, and clique that — every path that entered a
    // deleted region and left it anywhere survives as one hop.
    val delAdj = graph.adj.join(del, col("id") === col("__del"))
      .select(col("id"), col("nbr_id"))
    val delDelEdges = delAdj
      .join(del.withColumnRenamed("__del", "__del2"),
        col("nbr_id") === col("__del2"))
      .select(col("id").as("src"), col("nbr_id").as("dst"))
    val comps = ConnectedComponents.components(delDelEdges, "src", "dst")
    val boundary = delAdj
      .join(del.withColumnRenamed("__del", "__del2"),
        col("nbr_id") === col("__del2"), "left_anti")
      .join(comps.withColumnRenamed("id", "__cid"),
        col("id") === col("__cid"), "left")
      .select(coalesce(col("component"), col("id")).as("__grp"),
        col("nbr_id"))
      .distinct()
    val repair = boundary.select(col("__grp"), col("nbr_id").as("id"))
      .join(boundary.select(col("__grp"), col("nbr_id")), "__grp")
      .filter(col("id") =!= col("nbr_id"))
      .select("id", "nbr_id")
    val adj = liveEdges.select("id", "nbr_id")
      .unionByName(repair)
      .distinct()
    val entryIds = live
      .select(col(idCol).as("id"),
        md5(concat(lit("nsw:"), col(idCol).cast("string")).cast("binary"))
          .as("__h"))
      .orderBy(col("__h"), col("id"))
      .limit(entries)
      .collect().map(_.getLong(0)).toSeq
    Graph(adj, entryIds)
  }

  /**
   * Top-k by exact cosine via beam search over the graph.
   * Output: (id, score) ordered by (score DESC, id), k rows — the same
   * contract as [[PcaAnn.topK]]. Deterministic: scores are
   * `scale`-rounded before ranking and every tie breaks on id.
   *
   * `tombstones`: deleted ids stay in the beam for ROUTING (severing
   * paths through a deleted hub before compaction would cost recall)
   * but are excluded from the emitted top-k; the beam must carry
   * enough margin over k to absorb tombstoned slots (the shipped
   * beam = 64 vs k = 10 does, spec-pinned).
   */
  def topK(
      emb: DataFrame, idCol: String, vecCol: String, graph: Graph,
      query: Array[Float], k: Int, beam: Int, maxIters: Int = 12,
      scale: Int = 6, tombstones: Set[Long] = Set.empty): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(beam >= k, s"beam ($beam) must be >= k ($k)")
    require(maxIters > 0, s"maxIters must be positive, got $maxIters")
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    // When the store/adjacency are bucketed tables, the per-hop
    // id-equality probes must actually bucket-prune: Spark's planner
    // auto-DISABLES bucketed scans for plans with no join/aggregate on
    // the bucket key (DisableUnnecessaryBucketedScan), which throws
    // away exactly the point-lookup pruning this search depends on.
    // Pin it off for the search's own probes, restore after. The
    // toggle is session-global, so the whole window is SERIALIZED on
    // [[autoBucketLock]]: two concurrent searches (or a nested one
    // with a different setting) can no longer interleave set/restore
    // (r14 advice). A session clone can't carry the conf instead —
    // the probe plans execute under the session that built `emb` /
    // `graph.adj`, and re-homing those frames would drop the very
    // bucketed-scan relation being pruned. Unrelated queries planned
    // concurrently on the same session remain outside the guarantee:
    // the engine's documented sequential-session discipline.
    val AutoBucket = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    autoBucketLock.synchronized {
      val prevAutoBucket = spark.conf.get(AutoBucket, "true")
      spark.conf.set(AutoBucket, "false")
      try topKImpl(emb, idCol, vecCol, graph, query, k, beam, maxIters,
        scale, tombstones)
      finally spark.conf.set(AutoBucket, prevAutoBucket)
    }
  }

  /** Monitor for the autoBucketedScan set/restore window in [[topK]] —
    * one per JVM (the conf is per-session, but searches across child
    * sessions of one context are rare enough that a coarser lock is
    * simpler than a per-session registry). */
  private val autoBucketLock = new Object

  private def topKImpl(
      emb: DataFrame, idCol: String, vecCol: String, graph: Graph,
      query: Array[Float], k: Int, beam: Int, maxIters: Int,
      scale: Int, tombstones: Set[Long]): DataFrame = {
    val spark = emb.sparkSession
    val qv = typedLit(query.toSeq)
    // one pruned fetch: exact rounded cosine for a bounded id set
    def scoreIds(ids: Seq[Long]): Seq[(Long, Double)] = {
      if (ids.isEmpty) Seq.empty
      else emb
        .filter(col(idCol).isin(ids.map(Long.box): _*))
        .select(col(idCol).as("id"),
          round(GraftFunctions.knnCosineSimilarity(col(vecCol), qv), scale)
            .as("score"))
        .collect()
        .collect { case r if !r.isNullAt(1) => (r.getLong(0), r.getDouble(1)) }
        .toSeq
    }
    val beamOrd = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, s) => (-s, id)
    }
    val visited = scala.collection.mutable.Set(graph.entryIds: _*)
    var best = scoreIds(graph.entryIds).sorted(beamOrd).take(beam)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val beamIds = best.map(_._1)
      // No distinct() on the probe: it would add an exchange + an AQE
      // job to EVERY hop to dedup a relation the driver already holds
      // — the collect is bounded at beam × degree rows either way, and
      // the `visited` filter below dedups for free.
      val nbrs = graph.adj
        .filter(col("id").isin(beamIds.map(Long.box): _*))
        .select("nbr_id")
        .collect().map(_.getLong(0))
        .distinct.filterNot(visited).toSeq
      if (nbrs.isEmpty) converged = true
      else {
        visited ++= nbrs
        val merged = (best ++ scoreIds(nbrs)).sorted(beamOrd).take(beam)
        converged = merged.map(_._1) == beamIds
        best = merged
      }
      iter += 1
    }
    import spark.implicits._
    best.filterNot(t => tombstones(t._1)).take(k).toDF("id", "score")
  }
}
