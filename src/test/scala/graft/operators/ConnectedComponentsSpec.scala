package graft.operators

import graft.SparkFunSuite

class ConnectedComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def compMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Run `body` with the driver union-find gate forced OFF, so
    * [[ConnectedComponents.components]] takes the distributed
    * min-label-propagation loop — the path that runs at cluster scale. */
  private def withDistributedLoop[A](body: => A): A = {
    spark.conf.set("spark.graft.cc.driverEdgeGate", "0")
    try body finally spark.conf.unset("spark.graft.cc.driverEdgeGate")
  }

  test("chain collapses to one component labeled by the minimum id") {
    // 1-2, 2-3, 3-4: pairwise near-dups that are NOT all mutually
    // similar — the exact case pairwise dedup under-merges.
    assert(compMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters keep distinct labels") {
    val m = compMap(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(m === Map(
      1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("cycles and duplicate/reversed edges converge to the fixpoint") {
    val m = compMap(Seq((3L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 2L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long path converges within the iteration bound (diameter rounds)") {
    // Path 0-1-…-12: min-label propagation needs ~diameter rounds; the
    // default maxIters=25 must cover it and the result must be exact.
    val edges = (0L until 12L).map(i => (i, i + 1))
    val m = compMap(edges)
    assert(m === (0L to 12L).map(_ -> 0L).toMap)
  }

  test("componentSizes reports the cluster cardinality per member") {
    val byId = ConnectedComponents.componentSizes(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byId === Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      10L -> ((10L, 2L)), 11L -> ((10L, 2L))))
  }

  test("alternating-star variant agrees with min-label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val viaProp = compMap(edges)
      val viaStar = ConnectedComponents.componentsAlternating(
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(viaStar === viaProp)
    }
  }

  test("alternating-star flattens a long path in few rounds (the polylog contract)") {
    // 60-node path: diameter 59. Star rounds flatten geometrically —
    // the maxIters=12 bound would be impossibly tight for per-hop
    // propagation but is ample for the alternating algorithm.
    val edges = (0L until 59L).map(i => (i, i + 1))
    val m = ConnectedComponents.componentsAlternating(
        edges.toDF("a", "b"), "a", "b", maxIters = 12)
      .as[(Long, Long)].collect().toMap
    assert(m === (0L to 59L).map(_ -> 0L).toMap)
  }

  test("labels are independent of input partitioning") {
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (2L, 11L))
    val one = compMap(edges)
    val many = ConnectedComponents.components(
        edges.toDF("a", "b").repartition(7), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  // ------------------- distributed loop (driverEdgeGate=0) coverage.
  // The union-find gate swallows every small graph, so without these
  // the at-scale path — lazy-checkpoint rounds + sum-based convergence
  // — would be exercised by nothing.

  test("distributed loop: driver path and loop agree on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 40
      val edges = Seq.fill(35)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val viaDriver = compMap(edges) // default gate: union-find fast path
      val viaLoop = withDistributedLoop(compMap(edges))
      assert(viaLoop === viaDriver)
    }
  }

  test("distributed loop: long chain needs multiple rounds and converges exactly") {
    // Path 0-1-…-16: forces several propagation+doubling rounds through
    // the lazy-checkpoint convergence check (not just the round-0
    // neighborhood minimum).
    val edges = (0L until 16L).map(i => (i, i + 1))
    val m = withDistributedLoop(compMap(edges))
    assert(m === (0L to 16L).map(_ -> 0L).toMap)
  }

  test("distributed loop: labels independent of input partitioning") {
    withDistributedLoop {
      val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (2L, 11L), (30L, 31L))
      val one = compMap(edges)
      val many = ConnectedComponents.components(
          edges.toDF("a", "b").repartition(7), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(one === many)
    }
  }

  test("distributed loop: gate=0 honored even for an empty edge list") {
    // count()==0 <= 0 must NOT sneak the empty input onto the driver
    // path when the gate explicitly forces the loop; and the loop must
    // return an empty labeling, not throw.
    val m = withDistributedLoop(compMap(Seq.empty[(Long, Long)]))
    assert(m === Map.empty[Long, Long])
  }

  test("null edge ids fall through to the distributed loop, never NPE") {
    // The driver union-find unboxes primitive ids; a null id must route
    // the input to the loop (null is a plain groupBy key there).
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, 2L),
        org.apache.spark.sql.Row(null, 5L),
        org.apache.spark.sql.Row(2L, 3L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val out = ConnectedComponents.components(df, "a", "b").collect()
    val lbl = out.filter(r => !r.isNullAt(0))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(1L) === 1L && lbl(2L) === 1L && lbl(3L) === 1L)
  }
}
