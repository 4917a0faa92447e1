package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/**
 * Connected components over an undirected edge list — the missing step
 * between pairwise near-dup detection (Dedup / SimilarityJoin emit
 * PAIRS) and an actual dedup decision (keep one doc per CLUSTER).
 * Without transitive closure, A~B and B~C with A≁C would keep both A
 * and C's copies of the same boilerplate; components collapse the whole
 * chain to one representative (the minimum id).
 *
 * Algorithm: iterative min-label propagation with pointer doubling.
 *   label(v) ← min(label(v), min over neighbors u of label(u),
 *                  label(label(v)))
 * repeated until a fixpoint. Propagation alone needs one round per unit
 * of graph diameter; the label(label(v)) hop compresses label chains on
 * top of it. Worst-case O(log diameter) holds when labels form long
 * parent chains, but on chain graphs with RANDOM id placement the min
 * within a node's horizon is usually mid-horizon, so the measured gain
 * is a constant factor (~2×), not a log: the sf0.1 semantic graph
 * (1174 nodes, 910 edges, chain-shaped components) converges in 11
 * rounds, not ~5 (r10 profile; a second chained jump per round was
 * measured SLOWER — the extra join exceeds the round savings).
 * `maxIters` is a safety bound. Exact dedup graphs are small dense
 * clusters (diameter ≤ 3-4) and converge in 1-2 rounds.
 *
 * Scale design (100 TB): each round is TWO equality joins — edge list
 * with labels on the neighbor key, labels with itself on the label
 * key — plus ONE min-aggregate on the node key, all standard shuffles
 * that AQE skew-splits; no all-pairs work, no driver-side graph. The
 * per-round convergence check is an aggregate (count of changed
 * labels), not a data collect. `localCheckpoint` truncates the growing
 * lineage each round (on a real cluster with a fault-tolerance
 * requirement, swap for reliable `checkpoint` on distributed storage).
 * This is the Pregel CC shape plus the pointer-jumping trick from the
 * PRAM literature; [[componentsAlternating]] is the fully
 * diameter-independent O(log² n) alternative.
 */
object ConnectedComponents {

  /** Edge-count gate for the driver union-find fast path in
    * [[components]]: ≤ gate rows × 16 B ≈ 4 MB of driver memory — the
    * same order as `spark.sql.autoBroadcastJoinThreshold`'s 10 MB
    * default. Parameterised (`spark.graft.cc.driverEdgeGate`; set 0 to
    * force the distributed loop) because the right value is a cluster
    * sizing decision, not a constant. */
  private def driverEdgeGate(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.cc.driverEdgeGate", "262144").toLong

  /**
   * @param edges   pair list (one row per undirected edge)
   * @param srcCol  source-id column name
   * @param dstCol  destination-id column name
   * @return (id, component) for every node appearing in `edges`, where
   *         component = minimum id reachable from the node (including
   *         itself) — deterministic regardless of partitioning.
   */
  def components(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    // Symmetrize once; cache — every round re-joins the same edge
    // list. Pre-partitioned on the JOIN KEY v before the checkpoint:
    // LogicalRDD preserves the hash partitioning, so none of the
    // rounds re-exchanges the edge list for its propagation join
    // (labels arrive partitioned on u from their own groupBy — both
    // sides pre-placed). At fixture scale this is ~15% of the CC
    // stage; at cluster scale it deletes the one per-round shuffle
    // whose size is O(|E|), leaving only the O(|V|) aggregate
    // exchange (r10 profile, SCALING.md).
    // Symmetrize with ONE explode, not union(edges, edges-reversed):
    // the union form references the edge subtree twice and Catalyst
    // derives it once per branch — for threshold-join pair graphs
    // (LSH, blocked Jaccard) that executed the entire upstream join
    // twice before the first CC round even started.
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("u"), col(dstCol).as("v")),
        struct(col(dstCol).as("u"), col(srcCol).as("v")))).as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))
      .distinct()
      .repartition(col("v"))
      .localCheckpoint(true)

    // Size-gated driver fast path — the union-find analogue of a
    // broadcast join. The symmetrized edge list is already materialized
    // (checkpoint above), so its row count is one cheap cached-scan
    // job; when the PAIR GRAPH — not the corpus — fits the same order
    // of memory Spark would happily broadcast (driverEdgeGate rows ×
    // 16 B ≈ 4 MB, vs the 10 MB autoBroadcastJoinThreshold), the
    // transitive closure is a driver union-find over the collected
    // edges instead of O(log d) distributed rounds of 2 joins + 1
    // aggregate each. Near-dup pair graphs are SPARSE BY CONSTRUCTION
    // (threshold joins emit matches, not the corpus), so at bench
    // scale this replaces ~10-25 sequential jobs with one collect; at
    // 100 TB a billions-of-edges graph fails the gate and takes the
    // loop below, whose per-round shape is unchanged. Output is
    // bit-identical (min reachable id; randomized driver≡loop
    // equivalence pinned in ConnectedComponentsSpec, which also forces
    // the distributed loop with driverEdgeGate=0). Driver path requires
    // integral NON-NULL ids (a null id would NPE the unbox below, where
    // the loop treats null as a groupBy key); the null check rides the
    // same single aggregate job that sizes the gate. gate <= 0 is the
    // documented force-distributed setting, honored even for an empty
    // edge list.
    val intTypes: Set[org.apache.spark.sql.types.DataType] =
      Set(LongType, IntegerType)
    val gate = driverEdgeGate(edges)
    val gateStats =
      if (gate > 0 && sym.schema.fields.forall(f => intTypes(f.dataType)))
        Some(sym.agg(count(lit(1)), count(col("u")), count(col("v"))).first())
      else None
    if (gateStats.exists(s => s.getLong(0) <= gate &&
        s.getLong(1) == s.getLong(0) && s.getLong(2) == s.getLong(0))) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      sym.collect().foreach { row =>
        val u = if (row.get(0).isInstanceOf[Long]) row.getLong(0) else row.getInt(0).toLong
        val v = if (row.get(1).isInstanceOf[Long]) row.getLong(1) else row.getInt(1).toLong
        if (!parent.containsKey(u)) parent.put(u, u)
        if (!parent.containsKey(v)) parent.put(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv) }
      }
      // roots are already each component's minimum id: unions always
      // attach the larger root under the smaller, and every node's id
      // is itself a candidate root at insertion.
      val spark = edges.sparkSession
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      // snapshot ids first: find()'s path compression writes to the map
      val ids = parent.keySet().toArray(Array.empty[java.lang.Long])
      ids.foreach { id =>
        rows.add(org.apache.spark.sql.Row(id.longValue, find(id.longValue)))
      }
      val asLong = spark.createDataFrame(rows, StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("component", LongType, nullable = false))))
      val (idT, compT) = (sym.schema.fields(0).dataType, sym.schema.fields(1).dataType)
      return asLong.select(
        col("id").cast(idT).as("id"), col("component").cast(compT).as("component"))
    }

    // Round 0 fused into initialization: label(v) = min(v, min neighbor)
    // is what the first propagation round would compute, but it is a
    // plain aggregate over the edge list — no join, one job. Near-dup
    // clusters are cliques/stars (diameter ≤ 2), so this alone is
    // usually the fixpoint and the loop below runs once to verify it.
    var labels = sym.groupBy("u")
      .agg(least(col("u"), min(col("v"))).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // Min neighbor label per node, folded with the node's own label
      // AND the label's own label (pointer doubling: u adopts
      // label(label(u)), so label-chain length halves every round on top
      // of one-hop propagation — O(log diameter) rounds instead of
      // O(diameter), which matters for threshold-similarity graphs whose
      // largest component is a long chain, not a clique). The own label
      // rides through the same aggregate (tagged), so the convergence
      // test (any new < old?) is a filter over the already-checkpointed
      // result — no extra join job per round.
      val own = labels.select(col("u"), col("label"), lit(true).as("own"))
      val nbr = sym
        .join(labels.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("label"), lit(false).as("own"))
      // The doubling hop is provably a no-op on the FIRST loop pass:
      // round-0 labels are closed-1-neighborhood minima, so label(u) is
      // u itself or a direct neighbor v*, and label(v*) already rides in
      // the nbr aggregate. Skipping it saves one labels⋈labels shuffle
      // on shallow (clique/star) graphs, which converge right here.
      val hop =
        if (iter == 0) Seq.empty
        else Seq(labels
          .join(labels.select(col("u").as("label"), col("label").as("__hop")), "label")
          .select(col("u"), col("__hop").as("label"), lit(false).as("own")))
      // LAZY checkpoint + one FULL aggregate: the convergence count's
      // map side computes every partition of `next`, and Spark's
      // end-of-job doCheckpoint persists exactly what the job computed
      // — so ONE action per round both materializes the round's labels
      // and returns the verdict, where the eager-checkpoint +
      // separate-isEmpty shape paid two scheduled actions per round.
      val next = (Seq(own, nbr) ++ hop).reduce(_ union _)
        .groupBy("u")
        .agg(min("label").as("label"),
          min(when(col("own"), col("label"))).as("__old"))
        .localCheckpoint(false)
      val changedRow = next
        .agg(sum(when(col("label") < col("__old"), 1L)).as("__changed"))
        .first()
      converged = changedRow.isNullAt(0) || changedRow.getLong(0) == 0L
      labels = next.drop("__old")
      iter += 1
    }
    labels.select(col("u").as("id"), col("label").as("component"))
  }

  /**
   * Alternating-star connected components — the polylog-round variant
   * (public algorithm: Kiveris et al., "Connected Components in
   * MapReduce and Beyond"; alternating large-star/small-star converges
   * in O(log² n) rounds, vs one round per unit of graph DIAMETER for
   * min-label propagation — an adversarial path graph of 10⁶ nodes
   * needs 10⁶ propagation rounds but only ~tens of star rounds, since
   * the star operations flatten trees geometrically on ANY topology).
   *
   *  - large-star(u): every neighbor v > u re-attaches to
   *    m(u) = min(Γ(u) ∪ u)
   *  - small-star(u): every neighbor v ≤ u (and u) re-attaches to m(u)
   *
   * Both are implemented join-free as ONE window-min over the edge
   * list's u-partition followed by a per-row rewrite + distinct — no
   * `collect_list` of neighbor sets, so a hub node with 10⁸ neighbors
   * never materializes a buffer (the known OOM hazard of the naive
   * formulation); AQE splits the hub's shuffle partition instead.
   * Fixpoint = the canonical (child, parent) edge set stops changing;
   * at that point edges ARE the (id, component) map.
   *
   * Same contract as [[components]]: every node of `edges` labeled
   * with its component's minimum id. Cross-checked against
   * [[components]] property-style in the spec.
   */
  def componentsAlternating(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u")

    // large-star: neighbors larger than u hang under m(u) = min(Γ(u) ∪ u)
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      sym.withColumn("m", least(min(col("v")).over(w), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    // small-star: u and its not-larger neighbors hang under m(u)
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      canon.withColumn("m", least(min(col("v")).over(w), col("u")))
        .select(col("u"), col("v"), col("m"))
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var cur = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      // fixpoint test on the canonical edge set: symmetric difference
      // empty (two slim anti joins — aggregates, no data to the driver)
      val gone = cur.except(next).limit(1).count()
      val fresh = next.except(cur).limit(1).count()
      converged = gone == 0 && fresh == 0
      cur = next
      iter += 1
    }
    // At the fixpoint every edge is (node, its component root); roots
    // themselves appear only on the parent side.
    val roots = cur.select(col("v")).except(cur.select(col("u")))
      .select(col("v").as("id"), col("v").as("component"))
    cur.select(col("u").as("id"), col("v").as("component")).union(roots)
  }

  /**
   * Components plus per-cluster size — the ready-to-use dedup verdict:
   * keep the row whose id == component, drop the other n_members - 1.
   */
  def componentSizes(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    components(edges, srcCol, dstCol, maxIters)
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("component")))
  }
}
