package graft.operators

import graft.SparkFunSuite

class ConnectedComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def compMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

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
}
