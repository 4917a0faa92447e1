package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/** Randomized ground-truth parity for the round's graph/cluster
  * operators: DBSCAN vs the quadratic definition and k-core vs
  * sequential min-degree peeling, over ScalaCheck-generated inputs —
  * the same discipline as the IVF tombstone-churn property. Trial
  * counts are sized to the per-trial Spark-job cost (each trial runs
  * a full multi-job plan, not a pure function). */
class GraphClusterPropertySpec extends SparkFunSuite {
  import spark.implicits._

  test("property: dbscan ≡ quadratic reference on random point sets") {
    def reference(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
        : Seq[(Long, Long, String)] = {
      val ids = pts.map(_._1)
      val coord = pts.map(p => p._1 -> (p._2, p._3)).toMap
      def near(a: Long, b: Long): Boolean = {
        val (ax, ay) = coord(a); val (bx, by) = coord(b)
        val dx = ax - bx; val dy = ay - by
        dx * dx + dy * dy <= eps * eps
      }
      val cores = ids.filter(a => ids.count(near(a, _)) >= minPts).toSet
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
          val cn = cores.filter(near(a, _))
          if (cn.nonEmpty) (a, cn.map(lbl).min, "border") else (a, -1L, "noise")
        }
      }
    }
    val genCase = for {
      n <- Gen.chooseNum(1, 36)
      // coordinates on a small grid so clusters/borders/noise all occur;
      // negative range exercises the floor-division cells
      pts <- Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(-200000L, 200000L), Gen.chooseNum(-200000L, 200000L)))
      eps <- Gen.oneOf(30000L, 60000L, 90000L)
      minPts <- Gen.chooseNum(1, 4)
    } yield (pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
      eps, minPts)
    val prop = Prop.forAll(genCase) { case (pts, eps, minPts) =>
      val got = DensityCluster.dbscan(
        pts.toDF("id", "x", "y").repartition(3), "id", "x", "y", eps, minPts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      got == reference(pts, eps, minPts)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: kcore ≡ sequential min-degree peeling on random graphs") {
    def peel(edges: Seq[(String, String)]): Map[String, Long] = {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => if (e._1 < e._2) e else e.swap).distinct
      var adj = und.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
      var core = Map.empty[String, Long]
      var k = 0L
      while (adj.nonEmpty) {
        val victims = adj.filter(_._2.size <= k).keys.toSeq
        if (victims.isEmpty) k += 1
        else {
          victims.foreach(v => core += v -> k)
          adj = (adj -- victims).map { case (v, ns) => v -> (ns -- victims) }
        }
      }
      core
    }
    val genCase = for {
      nv <- Gen.chooseNum(3, 25)
      ne <- Gen.chooseNum(2, 60)
      edges <- Gen.listOfN(ne, Gen.zip(
        Gen.chooseNum(0, nv - 1), Gen.chooseNum(0, nv - 1)))
    } yield edges.map { case (a, b) => (s"n$a", s"n$b") }.filter(e => e._1 != e._2)
    val prop = Prop.forAll(genCase) { edges =>
      edges.isEmpty || {
        val got = LinkRank.kcore(edges.toDF("src", "dst").repartition(3))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        got == peel(edges)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
