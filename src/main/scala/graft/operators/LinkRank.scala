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

  /**
   * Synchronous label propagation (Raghavan et al. 2007) over the
   * UNDIRECTED domain graph — the community-detection leg of the
   * link-analysis toolkit: PageRank ranks domains, HITS separates
   * hubs from authorities, and LPA groups them into link communities
   * (mirror farms, forum rings, language clusters) that curation
   * treats as units — down-weighting a whole mirror ring instead of
   * rediscovering each member.
   *
   * DETERMINISTIC variant: the textbook algorithm visits vertices in
   * random order with random tie-breaks, which is non-reproducible by
   * construction. Here every vertex updates SIMULTANEOUSLY each round
   * to the most frequent neighbor label, ties broken by the LEAST
   * label string — pure count/min aggregates, so the result is exact
   * under any partitioning. (Synchronous LPA can two-cycle on
   * bipartite structures; a fixed iteration count makes that a
   * bounded, reproducible artifact rather than nontermination.)
   *
   * Shape per round: one equality join (edges × labels) + one
   * count aggregate + one max/min resolution aggregate — all
   * shuffle-partial-friendly; lineage truncated per round.
   */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10], got $iters")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // undirected simple graph, self-loops dropped (they vote for the
    // incumbent label and only slow convergence)
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val verts = und.select(col("a").as("v")).distinct().localCheckpoint(true)

    var labels = verts.select(col("v"), col("v").as("label"))
    var i = 0
    while (i < iters) {
      val nbr = und
        .join(labels.select(col("v").as("b"), col("label")), "b")
        .select(col("a").as("v"), col("label"))
      val counts = nbr.groupBy("v", "label").agg(count(lit(1)).as("cnt"))
      val top = counts.groupBy("v").agg(max(col("cnt")).as("mc"))
      val winner = counts.join(top, "v")
        .filter(col("cnt") === col("mc"))
        .groupBy("v").agg(min(col("label")).as("label")) // least-label tie-break
      labels = verts
        .join(winner, Seq("v"), "left")
        .select(col("v"), coalesce(col("label"), col("v")).as("label"))
        .localCheckpoint(true)
      i += 1
    }
    labels.select(col("v").as("domain"), col("label").as("community"))
  }

  /**
   * BFS depth from a seed set over the DIRECTED link graph — crawl
   * depth: how many link hops a domain sits from the curated seeds.
   * Depth is the frontier-scheduling prior ([[Frontier]]) and the
   * standard crawl-scope cut ("seeds + 2 hops"); it is also the
   * honest version of "discovery wave" metrics.
   *
   * Min-plus iteration, all integral: depth(v) = min over rounds of
   * (1 + depth of any in-neighbor), seeds at 0. Exactly `maxDepth`
   * rounds — a fixed, schedulable job graph; unreached domains are
   * absent from the output (their depth is not ∞, it is "not in
   * scope", which is the decision the cut needs). Each round is one
   * equality join of the CURRENT frontier against the edge list plus
   * one min-aggregate — the frontier (newly reached vertices only)
   * shrinks monotonically, so late rounds are near-free.
   */
  def bfsDepth(
      edges: DataFrame,
      seeds: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      seedCol: String = "domain",
      maxDepth: Int = 4): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 16,
      s"maxDepth must be in [1,16], got $maxDepth")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    var dist = seeds.select(col(seedCol).as("v")).distinct()
      .select(col("v"), lit(0L).as("d"))
      .localCheckpoint(true)
    var frontier = dist
    var i = 1
    while (i <= maxDepth) {
      val reached = e
        .join(frontier.select(col("v").as("src")), "src")
        .select(col("dst").as("v"), lit(i.toLong).as("d"))
        .distinct()
      // keep only first-time discoveries: the new frontier
      frontier = reached.join(dist.select(col("v")), Seq("v"), "left_anti")
        .localCheckpoint(true)
      dist = dist.unionByName(frontier).localCheckpoint(true)
      i += 1
    }
    dist.select(col("v").as("domain"), col("d").as("depth"))
  }
}
