package graft.operators

import graft.SparkFunSuite

/** DBSCAN: hand-computed clusters/border/noise, inclusive eps
  * boundary, negative-coordinate cells, partition invariance, and a
  * full parity check against an independent in-memory quadratic
  * reference on seeded pseudo-random points. */
class DensityClusterSpec extends SparkFunSuite {
  import spark.implicits._

  private def df(pts: Seq[(Long, Long, Long)]) =
    pts.toDF("id", "x", "y")

  // Cluster A (ids 0-3, all core), border id 4 at EXACTLY eps from id 1,
  // noise id 5, cluster B (ids 6-8, negative coords, all core).
  private val hand = Seq(
    (0L, 0L, 0L), (1L, 50000L, 0L), (2L, 0L, 50000L), (3L, 50000L, 50000L),
    (4L, 150000L, 0L),
    (5L, 500000L, 500000L),
    (6L, -300000L, -300000L), (7L, -350000L, -300000L), (8L, -300000L, -350000L))

  test("hand-computed clusters, border, and noise (eps inclusive, negative cells)") {
    val out = DensityCluster.dbscan(df(hand), "id", "x", "y",
      epsMicro = 100000L, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out === Seq(
      (0L, 0L, "core"), (1L, 0L, "core"), (2L, 0L, "core"), (3L, 0L, "core"),
      (4L, 0L, "border"),
      (5L, -1L, "noise"),
      (6L, 6L, "core"), (7L, 6L, "core"), (8L, 6L, "core")))
  }

  test("summary card: per-cluster size with core/border split, noise row first") {
    val lbl = DensityCluster.dbscan(df(hand), "id", "x", "y", 100000L, 3)
    val s = DensityCluster.dbscanSummary(lbl)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(s === Seq((-1L, 1L, 0L, 0L), (0L, 5L, 4L, 1L), (6L, 3L, 3L, 0L)))
  }

  test("minPts = 1: every point is core; isolated cores are singleton clusters") {
    val pts = Seq((10L, 0L, 0L), (20L, 1000000L, 0L), (30L, 0L, 1000000L))
    val out = DensityCluster.dbscan(df(pts), "id", "x", "y", 100L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out === Seq((10L, 10L, "core"), (20L, 20L, "core"), (30L, 30L, "core")))
  }

  test("plan guard: the eps-join is a hash join on cell keys, never cartesian") {
    val plan = DensityCluster.dbscan(df(hand), "id", "x", "y", 100000L, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("result is identical under different partitionings") {
    val a = DensityCluster.dbscan(df(hand).repartition(1), "id", "x", "y", 100000L, 3)
      .collect().toSeq
    val b = DensityCluster.dbscan(df(hand).repartition(7), "id", "x", "y", 100000L, 3)
      .collect().toSeq
    assert(a === b)
  }

  /** Independent quadratic reference: same pinned semantics, no grid. */
  private def reference(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int): Seq[(Long, Long, String)] = {
    val ids = pts.map(_._1)
    val coord = pts.map(p => p._1 -> (p._2, p._3)).toMap
    def near(a: Long, b: Long): Boolean = {
      val (ax, ay) = coord(a); val (bx, by) = coord(b)
      val dx = ax - bx; val dy = ay - by
      dx * dx + dy * dy <= eps * eps
    }
    val cores = ids.filter(a => ids.count(near(a, _)) >= minPts).toSet
    // components over core-core edges via repeated min-label sweeps
    var lbl = cores.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (a <- cores; b <- cores if near(a, b)) {
        val m = math.min(lbl(a), lbl(b))
        if (lbl(a) != m) { lbl += a -> m; changed = true }
        if (lbl(b) != m) { lbl += b -> m; changed = true }
      }
    }
    ids.sorted.map { a =>
      if (cores(a)) (a, lbl(a), "core")
      else {
        val coreNbr = cores.filter(near(a, _))
        if (coreNbr.nonEmpty) (a, coreNbr.map(lbl).min, "border")
        else (a, -1L, "noise")
      }
    }
  }

  test("parity with the in-memory quadratic reference on seeded random points") {
    // 90 deterministic points in a grid-spanning window: multiple
    // clusters, borders, and noise at eps = 80000 / minPts = 3
    // (fixture measured: 54 core / 26 border / 10 noise).
    val pts = (0 until 90).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      val h2 = (h * 2654435761L + 101L) & 0xffffffffL
      val x = (h % 800000L) - 400000L
      val y = (h2 % 800000L) - 400000L
      (i.toLong, x, y)
    }
    val got = DensityCluster.dbscan(df(pts), "id", "x", "y", 80000L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = reference(pts, 80000L, 3)
    assert(got === want)
    // sanity: the fixture exercises all three roles
    assert(want.exists(_._3 == "core") && want.exists(_._3 == "border")
      && want.exists(_._3 == "noise"))
  }

  test("cell keys stay integral: neighbors pair up at coordinates beyond 2^53") {
    // With the former DoubleType cell key ((v - pmod) / eps), quotients
    // near 2^62/eps lose low bits to the 53-bit mantissa, so equal
    // cells can hash apart and true neighbors silently drop. The
    // LongType `div` key is exact at any coordinate/eps ratio.
    val base = 4611686018427387000L // ~2^62, not eps-aligned
    val pts = Seq(
      (1L, base, base), (2L, base + 2L, base + 1L), (3L, base + 4L, base),
      (10L, base - 1000000L, base)) // far away: noise
    val got = DensityCluster.dbscan(df(pts), "id", "x", "y", 5L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = reference(pts, 5L, 3)
    assert(got === want)
    assert(got.count(_._3 == "core") >= 3) // the trio found each other
    assert(got.find(_._1 == 10L).get._3 === "noise")
  }
}
