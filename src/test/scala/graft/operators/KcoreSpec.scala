package graft.operators

import graft.SparkFunSuite

/** k-core via the H-operator iteration: hand-computed clique+tail and
  * cycle cores, self-loop/duplicate-edge hygiene, partition
  * invariance, and parity with the sequential min-degree peeling
  * reference on a seeded random graph. */
class KcoreSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], parts: Int = 3): Map[String, Long] =
    LinkRank.kcore(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("4-clique with a 2-hop tail: clique cores 3, tail cores 1") {
    val clique = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val cores = run(clique ++ Seq("a" -> "e", "e" -> "f"))
    assert(cores === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "e" -> 1L, "f" -> 1L))
  }

  test("cycle is its own 2-core; self-loops and duplicate edges are dropped") {
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "a" -> "a",           // self-loop: ignored
      "b" -> "a", "a" -> "b") // duplicates/reverse: collapse
    assert(run(cyc) === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
  }

  /** Sequential min-degree peeling — the textbook exact algorithm. */
  private def peel(edges: Seq[(String, String)]): Map[String, Long] = {
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
        victims.foreach { v => core += v -> k }
        adj = (adj -- victims).map { case (v, ns) => v -> (ns -- victims) }
      }
    }
    core
  }

  test("parity with sequential peeling on a seeded random graph") {
    val edges = (0 until 150).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      (s"n${h % 60}", s"n${(h / 60) % 60}")
    }.filter(e => e._1 != e._2)
    val want = peel(edges)
    assert(run(edges) === want)
    assert(want.values.max >= 2L) // fixture has non-trivial cores
  }

  test("result is identical under different partitionings") {
    val edges = (0 until 80).map { i =>
      val h = (i * 1103515245L + 12345L) & 0x7fffffffL
      (s"n${h % 30}", s"n${(h / 30) % 30}")
    }.filter(e => e._1 != e._2)
    assert(run(edges, parts = 1) === run(edges, parts = 7))
  }

  test("long chain converges under the default bound (linear-rate topology)") {
    // A path's H-operator needs ~L/2 rounds (the 1-labels creep inward
    // one step per round from each end) — the r13 default of 30 would
    // have returned silent overestimates here; 100 covers it.
    val chain = (0 until 79).map(i => (s"p$i", s"p${i + 1}"))
    val cores = run(chain)
    assert(cores.values.toSet === Set(1L))
  }

  test("exhausting maxIters without a fixpoint refuses loudly") {
    val chain = (0 until 79).map(i => (s"p$i", s"p${i + 1}"))
    val e = intercept[IllegalArgumentException] {
      LinkRank.kcore(chain.toDF("src", "dst"), maxIters = 5).collect()
    }
    assert(e.getMessage.contains("fixpoint"))
  }
}
