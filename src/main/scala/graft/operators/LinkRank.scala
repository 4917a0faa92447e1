package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank over the domain link graph — the ranking stage of crawl
 * curation, between link discovery ([[HtmlExtract]]/[[UrlOps]] emit
 * (src_domain, dst_domain) edges) and frontier scheduling
 * ([[Frontier]] consumes per-domain priorities). Domain-level rank is
 * the standard crawl-quality prior: it decides which discovered URLs
 * are worth fetch budget and which sources a training-data pipeline
 * should up/down-weight.
 *
 * INTEGER-EXACT variant: ranks live in micro-units (Long), each
 * iteration computes
 *
 *   r'(v) = (1-d)·unit  +  d · Σ_{u→v} (r(u) div outdeg(u))
 *
 * entirely in integral arithmetic (`div` = integral division; the
 * damping factor d is the exact rational dampNum/dampDen). Sums of
 * Longs are associative and commutative, so the result is BITWISE
 * deterministic regardless of partitioning, task order, or AQE
 * re-planning — float PageRank is not reproducible across runs on a
 * real cluster, which makes every downstream artifact (frontier
 * ordering, mixture weights) non-reproducible too. The div remainders
 * and dangling-node mass (outdeg 0) deterministically leak — the
 * "lost mass" PageRank variant; ordering, which is what curation
 * consumes, is unaffected.
 *
 * Scale design (100 TB): the page graph never ranks — edges arrive
 * pre-aggregated to registrable-domain level (the [[UrlOps
 * .registeredDomain]] key), ~1e8 vertices from 1e11 pages, and are
 * DISTINCT'd to a simple graph (one domain's thousand links to a
 * neighbor count once — resists link-farm inflation). Each iteration
 * is two equality joins on `src` plus one sum-aggregate on `dst`:
 * standard shuffles that AQE skew-splits, with map-side partial sums
 * because Long addition is a partial aggregate. No driver-side graph,
 * no collect; `localCheckpoint` truncates lineage per round exactly
 * like [[ConnectedComponents]] (swap for reliable `checkpoint` on a
 * cluster needing fault tolerance). Fixed iteration count — the crawl
 * literature's 3–5 rounds captures the ordering — so the job graph is
 * static and schedulable.
 */
object LinkRank {

  /**
   * @param edges   directed edge list; duplicates collapse (simple graph)
   * @param srcCol  source-domain column name
   * @param dstCol  destination-domain column name
   * @param iters   fixed iteration count
   * @param unit    rank micro-unit scale (initial rank per vertex)
   * @return (domain, rank_micros) for every vertex of the graph,
   *         bitwise-deterministic under any partitioning.
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 5,
      dampNum: Long = 85,
      dampDen: Long = 100,
      unit: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")

    // Simple graph, materialized once — every round re-joins it.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)

    val base = (unit * (dampDen - dampNum)) / dampDen
    var ranks = verts.select(col("v"), lit(unit).as("r"))
    var i = 0
    while (i < iters) {
      // Σ over in-edges of the sender's equal share, all integral.
      val contrib = e
        .join(deg, "src")
        .join(ranks.select(col("v").as("src"), col("r").as("rsrc")), "src")
        .select(col("dst").as("v"), expr("rsrc div outdeg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("s"))
      ranks = verts
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(base) +
            expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ranks.select(col("v").as("domain"), col("r").as("rank_micros"))
  }

  /**
   * HITS hubs & authorities (Kleinberg 1999) — the complementary
   * crawl-ranking signal to [[pageRank]]: an AUTHORITY is a page many
   * hubs point to (where the content is), a HUB is a page pointing to
   * many authorities (where the links are). Crawl curation uses both:
   * authorities up-weight sources, hubs seed frontier discovery.
   *
   * INTEGER-EXACT like [[pageRank]], with the same rationale, taken
   * further: HITS' usual per-iteration L2 normalization exists only
   * to stop float overflow and needs sqrt — instead the iteration
   * runs UNNORMALIZED in Long arithmetic (auth' = Σ_in hub,
   * hub' = Σ_out auth'), which computes the same RANKING (the
   * normalization is a positive scalar; ordering is invariant).
   * Growth bounds the iteration count: values grow ≤ (d_max²)^iters,
   * so `iters` ≤ ~6 at web degree scales keeps Longs safe — and
   * 3–5 rounds is all the ordering needs (same as PageRank).
   *
   * Shape: two equality joins + two sum-aggregates per round on the
   * DISTINCT'd domain graph, Long map-side partials, lineage
   * truncated per round. Bitwise deterministic under any
   * partitioning.
   */
  def hits(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)

    var hub = verts.select(col("v"), lit(1L).as("h"))
    var auth = verts.select(col("v"), lit(0L).as("a"))
    var i = 0
    while (i < iters) {
      // auth from CURRENT hubs, then hub from the NEW auths — the
      // classic in-round update order.
      auth = verts
        .join(e.join(hub.select(col("v").as("src"), col("h")), "src")
          .groupBy(col("dst").as("v")).agg(sum("h").as("s")),
          Seq("v"), "left")
        .select(col("v"), coalesce(col("s"), lit(0L)).as("a"))
        .localCheckpoint(true)
      hub = verts
        .join(e.join(auth.select(col("v").as("dst"), col("a")), "dst")
          .groupBy(col("src").as("v")).agg(sum("a").as("s")),
          Seq("v"), "left")
        .select(col("v"), coalesce(col("s"), lit(0L)).as("h"))
        .localCheckpoint(true)
      i += 1
    }
    hub.join(auth, Seq("v"))
      .select(col("v").as("domain"), col("h").as("hub"), col("a").as("auth"))
  }
}
