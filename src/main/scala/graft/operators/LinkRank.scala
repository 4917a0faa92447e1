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
   * Degree assortativity coefficient of the simple undirected graph
   * (Newman 2002, "Assortative mixing in networks") — the one-number
   * answer to "do hubs link to hubs": the Pearson correlation of the
   * endpoint degrees over the edge list. Social/citation graphs are
   * assortative (r > 0); the web graph — and engineered link farms
   * bolted onto organic pages — are DISassortative (r < 0), so a
   * crawl segment whose r flips sign against the corpus baseline is
   * a structural anomaly worth triage.
   *
   * Every moment (Σx, Σy, Σx², Σy², Σxy over the symmetrized edge
   * list, so x/y are exchangeable) is an exact integer aggregate in
   * DECIMAL(38,0); only the final r = cov/√(var_x·var_y) leaves the
   * integer grid, rounded to the package's 6-dp convention. One
   * degree aggregate + two broadcast-joined lookups + one global sum
   * — the same shuffle class as [[reciprocity]].
   *
   * Output: one row (n_edges, r_micro); r_micro = round(10⁶·r), 0 for
   * a degree-regular graph (zero variance on either margin).
   */
  def assortativity(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // Symmetrize so the edge relation is exchangeable in (x, y):
    // Newman's r is defined over unordered edges with both endpoint
    // orderings contributing.
    val sym = und.select(col("a").as("x"), col("b").as("y"))
      .unionByName(und.select(col("b").as("x"), col("a").as("y")))
      .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
    sym.agg(
        count(lit(1)).as("__m2"),
        sum(expr("CAST(dx AS DECIMAL(38,0))")).as("__sx"),
        sum(expr("CAST(dy AS DECIMAL(38,0))")).as("__sy"),
        sum(expr("CAST(dx AS DECIMAL(38,0)) * dx")).as("__sxx"),
        sum(expr("CAST(dy AS DECIMAL(38,0)) * dy")).as("__syy"),
        sum(expr("CAST(dx AS DECIMAL(38,0)) * dy")).as("__sxy"))
      .select(
        (col("__m2") / lit(2)).cast("long").as("n_edges"),
        when(
          expr("__m2 * __sxx - __sx * __sx") === lit(0) ||
            expr("__m2 * __syy - __sy * __sy") === lit(0), lit(0L))
          .otherwise(round(
            expr("CAST(__m2 * __sxy - __sx * __sy AS DOUBLE) / " +
              "sqrt(CAST(__m2 * __sxx - __sx * __sx AS DOUBLE) * " +
              "CAST(__m2 * __syy - __sy * __sy AS DOUBLE))") * lit(1000000.0))
            .cast("long"))
          .as("r_micro"))
  }

  /**
   * Newman modularity of a community assignment over the simple
   * undirected graph (Newman & Girvan 2004) — the "are these
   * communities real" gate behind [[labelPropagation]]: LPA always
   * RETURNS labels; modularity says whether they beat the random-
   * graph null model. Per community c with e_c intra-community
   * edges, d_c total degree and m total edges:
   *
   *   Q = Σ_c [ e_c/m − (d_c/2m)² ]
   *     = Σ_c (4·m·e_c − d_c²) / (4m²)
   *
   * — the right-hand form keeps every term an exact integer product
   * in DECIMAL(38,0) (m ≲ 10¹², so 4m² ≲ 4·10²⁴ and d_c² ≤ (2m)²),
   * and `q_micro` = 10⁶·contribution div 4m² is exact per community.
   * Shape: two broadcast-joined label lookups on the edge list, one
   * count per community, one degree sum — no new shuffle class beyond
   * the LPA rounds themselves.
   *
   * @param edges  directed edge list (symmetrized/deduped internally,
   *               self-loops dropped — the [[labelPropagation]] graph)
   * @param communities (domain, community) assignment to score
   * @return per community: (community, n_nodes, intra_edges,
   *         degree_sum, q_micro), ordered by community.
   */
  def modularity(
      edges: DataFrame,
      communities: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val lbl = communities.select(
      col("domain").as("__d"), col("community"))
    val withLbls = und
      .join(lbl.select(col("__d").as("a"), col("community").as("__ca")), "a")
      .join(lbl.select(col("__d").as("b"), col("community").as("__cb")), "b")
    val intra = withLbls.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("__deg"))
      .join(lbl.withColumnRenamed("__d", "v"), "v")
    val perC = deg.groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("__deg").as("degree_sum"))
    val m = und.agg(count(lit(1)).as("__m"))
    perC.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"))
      .crossJoin(broadcast(m))
      .withColumn("q_micro", expr(
        "CAST((1000000 * (4 * CAST(__m AS DECIMAL(38,0)) * intra_edges - " +
          "CAST(degree_sum AS DECIMAL(38,0)) * degree_sum)) div " +
          "(4 * CAST(__m AS DECIMAL(38,0)) * __m) AS BIGINT)"))
      .drop("__m")
      .orderBy("community")
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

  /**
   * Per-domain triangle count and local clustering coefficient over
   * the undirected simple link graph — the link-farm / tight-ring
   * signal: organic link neighborhoods are sparse (clustering near
   * 0), reciprocal-link schemes and mirror rings close into cliques
   * (clustering near 1). The CURATION use: a high-clustering,
   * high-degree domain's inlinks are self-endorsement, not
   * independent endorsement, and its rank/priority should discount
   * them (the same reason HITS/TrustRank literature weights by
   * neighborhood diversity).
   *
   * Algorithm: degree-ordered orientation (Suri & Vassilvitskii,
   * WWW 2011 "Counting triangles and the curse of the last reducer"):
   * each undirected edge is directed toward its HIGHER (degree, name)
   * endpoint, wedges are enumerated only at an edge's lower endpoint,
   * and a wedge closes iff its (v, w) candidate exists as an oriented
   * edge. Every triangle is found exactly once, and the wedge count
   * at a vertex is O(d_oriented²) where d_oriented ≤ √|E| for EVERY
   * vertex — the celebrity-vertex blowup (d² wedges at a hub) cannot
   * happen, which is precisely what makes the shape safe at crawl
   * scale.
   *
   * Shape: canonicalize+distinct (one shuffle), a degree aggregate,
   * two equality joins (wedge build on the low endpoint, closure
   * probe on (v, w)), one per-vertex count — all hash joins on
   * bounded keys; no cartesian anywhere.
   *
   * Exact integer output: `clustering_micro =
   * (10^6 · 2 · n_tri) div (deg · (deg − 1))`, 0 for deg ≤ 1.
   */
  def triangles(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient toward the higher (degree, name) endpoint
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("w"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dw"))
    // wedges at the low endpoint: two oriented edges u→v, u→w with
    // (deg, name)(v) < (deg, name)(w); the closing edge, if present,
    // is oriented v→w by transitivity of the total order.
    val e1 = oriented.select(col("u"), col("w").as("x"), col("dw").as("dx"))
    val e2 = oriented.select(col("u"), col("w").as("y"), col("dw").as("dy"))
    val wedges = e1.join(e2, "u")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val closed = wedges.join(
      oriented.select(col("u").as("x"), col("w").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    val perNode = closed
      .select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("v"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("v").as("domain"), col("deg").cast("long").as("degree"),
        col("n_tri").cast("long").as("n_tri"),
        when(col("deg") > 1,
          expr("(1000000 * 2 * n_tri) div (deg * (deg - 1))"))
          .otherwise(0L).as("clustering_micro"))
  }

  /**
   * k-core decomposition — the core NUMBER of every vertex: the
   * largest k such that the vertex survives in the subgraph where
   * every vertex keeps degree ≥ k. The densest-region signal that
   * degree alone misses: a spam farm's vertices sit in a high core
   * (mutually dense) while an organic hub of the same degree does
   * not, which makes coreness the third rank-inflation discount next
   * to [[triangles]]' clustering and [[reciprocity]] (Seidman 1983;
   * Kitsak et al. 2010 use it as the influence predictor).
   *
   * Algorithm: the H-operator iteration (Lü, Zhou, Zhang, Stanley,
   * PNAS 2016) — init c(v) = deg(v), then repeat
   *   c(v) ← H({c(u) : u ∈ N(v)})
   * (H = largest h with ≥ h neighbor values ≥ h) until no value
   * changes; the fixpoint is exactly the core number. This is the
   * distributable formulation: the textbook min-degree peeling is
   * inherently sequential, while each H round here is one edge⋈label
   * join plus one per-vertex window aggregate. The sequence is
   * monotone non-increasing from the degree init, so convergence is
   * guaranteed; `maxIters` is a safety bound like
   * [[ConnectedComponents]]'s. The H value is order-invariant under
   * value ties (equal neighbor labels are interchangeable in the
   * rank), so the result is deterministic under any partitioning.
   *
   * Scale shape (100 TB): per round, one equality join of the
   * symmetrized edge list (pre-partitioned on the join key, cached
   * once) with the |V|-row label relation, one window rank inside the
   * vertex partition, one max-aggregate — no per-vertex neighbor
   * ARRAY is ever collected, so a 10⁸-degree hub streams through the
   * window instead of materializing a collect_list. Rounds needed in
   * practice ≈ a small constant (the fixture converges in ≤ 4).
   *
   * @return (domain, core) for every vertex of the simple undirected
   *         graph (self-loops dropped, duplicate edges collapsed).
   */
  def kcore(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIters: Int = 100): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("v"))
      .localCheckpoint(true)

    var labels = sym.groupBy("u").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("c").desc)
    while (!converged && iter < maxIters) {
      val next = sym
        .join(labels.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("c"))
        .withColumn("__rn", row_number().over(w).cast("long"))
        .groupBy("u")
        .agg(max(least(col("__rn"), col("c"))).as("c"))
        .localCheckpoint(true)
      // Monotone non-increasing: any strict decrease means not done.
      converged = next
        .join(labels.withColumnRenamed("c", "__old"), "u")
        .filter(col("c") < col("__old")).isEmpty
      labels = next
      iter += 1
    }
    // The H-operator converges at a LINEAR rate on path-like graphs
    // (unlike ConnectedComponents' pointer doubling), so a long-chain
    // topology can exhaust the bound. Non-fixpoint labels are silent
    // OVERESTIMATES of the core numbers — refuse loudly rather than
    // ship a wrong answer.
    require(converged,
      s"kcore did not reach a fixpoint in $maxIters iterations — " +
        "core numbers would be overestimates on this topology " +
        "(long chains converge linearly); raise maxIters")
    labels.select(col("u").as("domain"), col("c").cast("long").as("core"))
  }

  /**
   * Per-domain link reciprocity — the link-exchange signal: organic
   * web linking is overwhelmingly one-directional (a page cites a
   * source; the source doesn't cite back), so a domain whose
   * out-links are mostly RECIPROCATED (u→v and v→u) is in a link
   * exchange — the oldest rank-inflation scheme, and with
   * [[triangles]]' clustering coefficient the second curation
   * discount signal. Newman (2002) "Assortative mixing in networks"
   * frames reciprocity as the first-order graph correlation.
   *
   * Shape: distinct directed edges (one shuffle), one self-join on
   * the reversed key pair to flag reciprocated edges, one per-source
   * aggregate — all equality hash joins.
   *
   * Output per domain: out_deg, n_reciprocal, reciprocity_micro =
   * (10^6 · n_reciprocal) div out_deg.
   */
  def reciprocity(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val flagged = e.join(
      e.select(col("dst").as("src"), col("src").as("dst"),
        lit(1L).as("__back")),
      Seq("src", "dst"), "left")
    flagged.groupBy("src").agg(
        count(lit(1)).as("out_deg"),
        sum(coalesce(col("__back"), lit(0L))).as("n_reciprocal"))
      .select(col("src").as("domain"),
        col("out_deg").cast("long").as("out_deg"),
        col("n_reciprocal").cast("long").as("n_reciprocal"),
        expr("(1000000 * n_reciprocal) div out_deg").as("reciprocity_micro"))
  }

  /**
   * Top-k CO-CITATION pairs (Small 1973; Dean & Henzinger 1999's
   * related-pages signal): two domains are related when many distinct
   * sources link to BOTH — the link-graph analogue of "users who
   * bought X also bought Y", and the standard related-sites feature
   * a crawl exports to ranking. Distinct (src, dst) edges, one
   * self-join on src with dst_a < dst_b (each unordered pair once),
   * one count aggregate, TakeOrdered(k).
   *
   * Scale note: the self-join fans out quadratically in a single
   * source's out-degree — cap fan-out upstream with `maxOutDeg`
   * (sources above the cap are dropped: a directory page linking to
   * 10⁵ sites co-cites everything and carries no signal — the same
   * argument as Dedup's maxBucket).
   */
  def coCitation(
      edges: DataFrame, k: Int,
      maxOutDeg: Int = 64,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxOutDeg > 1, s"maxOutDeg must be > 1, got $maxOutDeg")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val capped = e.join(deg.filter(col("__od") <= maxOutDeg), "src")
    capped.as("a").join(capped.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .groupBy(col("a.dst").as("dom_a"), col("b.dst").as("dom_b"))
      .agg(count(lit(1)).as("n_cociting"))
      .select(col("dom_a"), col("dom_b"),
        col("n_cociting").cast("long").as("n_cociting"))
      .orderBy(col("n_cociting").desc, col("dom_a"), col("dom_b"))
      .limit(k)
  }

  /**
   * Mirror-host detection: hosts whose DISTINCT outlink sets are
   * identical are almost always the same site served under several
   * names (mirrors, CDNs, parked duplicates, staging copies) — the
   * host-level analogue of document dedup, and the standard crawl
   * deduplication step BEFORE per-page fetching: one representative
   * host is crawled, the rest are aliased to it.
   *
   * Fingerprint: md5 of the host's sorted distinct outlink list
   * (0x01-separated). The per-host link set materializes once inside
   * a single aggregate (outlink fan-out per host is bounded in
   * practice — cap upstream if a host exceeds memory), and after
   * that only the 32-byte fingerprint travels: the group-size
   * relation is |hosts| rows of (fp, n), and membership joins back
   * by fingerprint equality. A commutative alternative (sum of
   * per-link hashes — fully map-side combinable, no sorted list) is
   * the drop-in upgrade if a host's outlink list itself outgrows a
   * task; the sorted-list form is kept because the SQL oracle
   * replays it verbatim.
   *
   * Output: one row per host that HAS a mirror (group size ≥ 2):
   * (host, group_rep = least member name, n_hosts, n_links).
   */
  def mirrorGroups(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val fp = e.groupBy("src").agg(
      md5(concat_ws("\u0001", sort_array(collect_set(col("dst"))))
        .cast("binary")).as("fp"),
      count(lit(1)).as("n_links"))
    val groups = fp.groupBy("fp").agg(
      count(lit(1)).as("n_hosts"), min("src").as("group_rep"))
    fp.join(groups, "fp")
      .filter(col("n_hosts") >= 2)
      .select(col("src").as("host"), col("group_rep"),
        col("n_hosts").cast("long").as("n_hosts"),
        col("n_links").cast("long").as("n_links"))
  }
}
