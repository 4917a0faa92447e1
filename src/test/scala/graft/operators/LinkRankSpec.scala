package graft.operators

import graft.SparkFunSuite

/** Ground truth: an independent in-memory re-implementation of the
  * integer PageRank recurrence (plain Maps, no Spark), checked on a
  * hand-analyzable triangle and on random graphs. Determinism is
  * checked by re-running under a different partitioning. */
class LinkRankSpec extends SparkFunSuite {

  /** Reference: same recurrence, driver-side. */
  private def referenceRank(
      edges: Seq[(String, String)], iters: Int,
      unit: Long = 1000000L): Map[String, Long] = {
    val simple = edges.distinct
    val verts = simple.flatMap(e => Seq(e._1, e._2)).distinct
    val out = simple.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = verts.map(_ -> unit).toMap
    val base = unit * 15 / 100
    (1 to iters).foreach { _ =>
      val recv = simple
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map(e => r(e._1) / out(e._1)).sum
        }
      r = verts.map(v => v -> (base + 85 * recv.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int,
      parts: Int = 4): Map[String, Long] = {
    val s = spark
    import s.implicits._
    LinkRank.pageRank(
        edges.toDF("src", "dst").repartition(parts), iters = iters)
      .collect()
      .map(row => row.getString(0) -> row.getLong(1))
      .toMap
  }

  test("triangle with a dangler matches the hand recurrence") {
    // a -> b -> c -> a, plus c -> d where d dangles (mass leaks).
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val got = run(edges, iters = 3)
    assert(got === referenceRank(edges, iters = 3))
    // After round 1: a,b get 150000+850000=1000000; c's senders split.
    assert(got.keySet === Set("a", "b", "c", "d"))
    // d only ever receives half of c's share — strictly the smallest.
    assert(got("d") < got.values.max)
  }

  test("duplicate edges collapse to a simple graph") {
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"))
    val got = run(dup, iters = 2)
    assert(got === referenceRank(dup, iters = 2))
    // b must NOT out-rank c by edge multiplicity: a's share splits 50/50.
    assert(got("b") === got("c"))
  }

  test("matches the reference on random graphs, any partitioning") {
    val rnd = new scala.util.Random(909)
    (0 until 5).foreach { trial =>
      val n = 6 + rnd.nextInt(12)
      val edges = (0 until 3 * n).map { _ =>
        (s"d${rnd.nextInt(n)}", s"d${rnd.nextInt(n)}")
      }
      val want = referenceRank(edges, iters = 4)
      assert(run(edges, 4, parts = 1) === want, s"trial $trial parts=1")
      assert(run(edges, 4, parts = 7) === want, s"trial $trial parts=7")
    }
  }

  test("self-loops and isolated receivers are ranked, never dropped") {
    val edges = Seq(("a", "a"), ("a", "b"))
    val got = run(edges, iters = 2)
    assert(got === referenceRank(edges, iters = 2))
    assert(got.keySet === Set("a", "b"))
  }

  // ----------------------------------------------------------- HITS

  test("hits: star graph — the center is the hub, leaves are the authorities") {
    import spark.implicits._
    val edges = Seq(("hub", "a1"), ("hub", "a2"), ("hub", "a3"))
      .toDF("src", "dst")
    val out = LinkRank.hits(edges, iters = 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: auth(leaf) = hub0(hub) = 1; hub(hub) = sum of new auths = 3
    assert(out("hub") === ((3L, 0L)))
    assert(out("a1") === ((0L, 1L)) && out("a2") === ((0L, 1L)) &&
      out("a3") === ((0L, 1L)))
  }

  test("hits: two rounds on a hand graph match the manual recurrence") {
    import spark.implicits._
    // h -> {x, y}; z -> {x}
    val edges = Seq(("h", "x"), ("h", "y"), ("z", "x")).toDF("src", "dst")
    val out = LinkRank.hits(edges, iters = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: a(x)=2, a(y)=1; h(h)=3, h(z)=2
    // round 2: a(x)=h(h)+h(z)=5, a(y)=h(h)=3; h(h)=a(x)+a(y)=8, h(z)=a(x)=5
    assert(out("x") === ((0L, 5L)))
    assert(out("y") === ((0L, 3L)))
    assert(out("h") === ((8L, 0L)))
    assert(out("z") === ((5L, 0L)))
  }

  test("hits: duplicate edges collapse; bitwise deterministic under repartition") {
    import spark.implicits._
    val edges = (Seq.fill(7)(("h", "x")) ++ Seq(("h", "y"), ("z", "x")))
      .toDF("src", "dst")
    val a = LinkRank.hits(edges, iters = 3).orderBy("domain")
      .collect().map(_.toSeq).toSeq
    val b = LinkRank.hits(edges.repartition(5), iters = 3).orderBy("domain")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    // same as the simple graph (dup edge counted once)
    val simple = LinkRank.hits(
      Seq(("h", "x"), ("h", "y"), ("z", "x")).toDF("src", "dst"), iters = 3)
      .orderBy("domain").collect().map(_.toSeq).toSeq
    assert(a === simple)
  }

  test("lpa: two cliques joined by one bridge edge settle into two communities") {
    import spark.implicits._
    // K4 {a1..a4} + K4 {b1..b4}, bridge a4->b1: the 3-vs-1 intra
    // majority beats the bridge, so each clique converges to its
    // least member's label and the communities stay separate. (K3
    // cliques would NOT: their 2-2 ties let the min label cross the
    // bridge — a real property of synchronous min-tie-break LPA.)
    def k4(p: String) = for {
      i <- 1 to 4; j <- (i + 1) to 4
    } yield (s"$p$i", s"$p$j")
    val out = LinkRank.labelPropagation(
      (k4("a") ++ k4("b") :+ ("a4" -> "b1")).toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert((1 to 4).forall(i => out(s"a$i") === "a1"), out)
    assert((1 to 4).forall(i => out(s"b$i") === "b1"), out)
  }

  test("lpa: deterministic under repartition; least-label tie-break") {
    import spark.implicits._
    val edges = Seq(("m", "x"), ("m", "y"), ("n", "x"), ("n", "y"),
      ("x", "y")).toDF("src", "dst")
    val a = LinkRank.labelPropagation(edges, iters = 3)
      .orderBy("domain").collect().map(_.toSeq).toSeq
    val b = LinkRank.labelPropagation(edges.repartition(7), iters = 3)
      .orderBy("domain").collect().map(_.toSeq).toSeq
    assert(a === b)
    // round 1: m's neighbors {x,y} tie 1-1 -> least label "x" wins
    val r1 = LinkRank.labelPropagation(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1("m") === "x")
  }

  test("bfs: depths are shortest-path layers; unreached vertices absent") {
    import spark.implicits._
    // chain s -> a -> b -> c plus shortcut s -> b; d is unreachable
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "b"),
      ("d", "c")).toDF("src", "dst")
    val out = LinkRank.bfsDepth(edges, Seq("s").toDF("domain"), maxDepth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("s" -> 0L, "a" -> 1L, "b" -> 1L, "c" -> 2L))
  }

  test("bfs: maxDepth truncates; multiple seeds take the minimum wave") {
    import spark.implicits._
    val edges = Seq(("s1", "a"), ("a", "b"), ("b", "c"), ("s2", "b"))
      .toDF("src", "dst")
    val out = LinkRank.bfsDepth(edges, Seq("s1", "s2").toDF("domain"),
      maxDepth = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // b is depth 1 via s2, never 2 via s1; c is beyond maxDepth
    assert(out === Map("s1" -> 0L, "s2" -> 0L, "a" -> 1L, "b" -> 1L))
  }

  test("triangles: K4 plus a pendant — counts and clustering exact") {
    import spark.implicits._
    // 4-clique a,b,c,d (4 triangles, each vertex in 3) + pendant e—a.
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "e" -> "a")
    val out = LinkRank.triangles(k4.toDF("src", "dst"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a: deg 4, 3 triangles → 2·3·1e6 div (4·3) = 500000
    assert(out("a") === ((4L, 3L, 500000L)))
    // b,c,d: deg 3, 3 triangles → 6e6 div 6 = 1000000
    Seq("b", "c", "d").foreach(v => assert(out(v) === ((3L, 3L, 1000000L))))
    // pendant: deg 1, no triangles, clustering 0
    assert(out("e") === ((1L, 0L, 0L)))
  }

  test("triangles: duplicate/reversed/self edges collapse first") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "a", "a" -> "b", "a" -> "a",
      "b" -> "c", "c" -> "a").toDF("src", "dst")
    val out = LinkRank.triangles(edges)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("mirrors: identical outlink sets group; near-miss does not") {
    import spark.implicits._
    // x and y share {p, q} exactly (y's dup row collapses); z adds r.
    val edges = Seq(
      ("x", "p"), ("x", "q"),
      ("y", "q"), ("y", "p"), ("y", "p"),
      ("z", "p"), ("z", "q"), ("z", "r"),
      ("w", "p")).toDF("src", "dst")
    val rows = LinkRank.mirrorGroups(edges)
      .orderBy("group_rep", "host")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq === Seq(("x", "x", 2L, 2L), ("y", "x", 2L, 2L)))
  }

  test("cocitation: pair counts, ordering, and the out-degree cap") {
    import spark.implicits._
    // s1 and s2 both link {x, y}; s3 links {x, z}; hub links everything
    val edges = Seq(
      ("s1", "x"), ("s1", "y"), ("s2", "x"), ("s2", "y"), ("s3", "x"),
      ("s3", "z"),
      ("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w")).toDF("src", "dst")
    val top = LinkRank.coCitation(edges, k = 10, maxOutDeg = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // hub (out-degree 4 > 3) is dropped entirely
    assert(top.toSeq === Seq(("x", "y", 2L), ("x", "z", 1L)))
    val withHub = LinkRank.coCitation(edges, k = 1, maxOutDeg = 10)
      .collect().head
    assert((withHub.getString(0), withHub.getString(1),
      withHub.getLong(2)) === (("x", "y", 3L)))
  }

  test("reciprocity: mutual pair flagged, one-way and self edges not") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"),
      ("a", "b")).toDF("src", "dst")
    val out = LinkRank.reciprocity(edges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a: out {b, c}, reciprocated {b} → 500000 micro
    assert(out("a") === ((2L, 1L, 500000L)))
    assert(out("b") === ((1L, 1L, 1000000L)))
    assert(!out.contains("c")) // self-loop only → no out-edges
  }

  test("mirrors: separator blocks concatenation collisions") {
    import spark.implicits._
    // {"ab","c"} vs {"a","bc"} concatenate identically without the
    // 0x01 separator — they must NOT group.
    val edges = Seq(("x", "ab"), ("x", "c"), ("y", "a"), ("y", "bc"))
      .toDF("src", "dst")
    assert(LinkRank.mirrorGroups(edges).count() === 0L)
  }

  test("modularity: two bridged triangles under the ideal split") {
    val s = spark
    import s.implicits._
    // K3 {a,b,c} + K3 {x,y,z} + bridge a-x: m = 7, per community
    // e_c = 3, d_c = 7 → contribution (4·7·3 − 49)/196 = 35/196,
    // micro-floored 178571; Q ≈ 0.357.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("a", "x")).toDF("src", "dst")
    val comms = Seq(("a", "c1"), ("b", "c1"), ("c", "c1"),
      ("x", "c2"), ("y", "c2"), ("z", "c2")).toDF("domain", "community")
    val got = LinkRank.modularity(edges, comms)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      ("c1", 3L, 3L, 7L, 178571L), ("c2", 3L, 3L, 7L, 178571L)))
  }

  test("modularity: one community scores exactly 0; singletons negative") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val one = Seq(("a", "all"), ("b", "all"), ("c", "all"))
      .toDF("domain", "community")
    assert(LinkRank.modularity(edges, one)
      .collect().map(_.getLong(4)).toSeq === Seq(0L))
    val solo = Seq(("a", "a"), ("b", "b"), ("c", "c"))
      .toDF("domain", "community")
    // e_c = 0, d_c = 2, m = 3: −4·10⁶/36 truncated toward zero = −111111
    assert(LinkRank.modularity(edges, solo)
      .collect().map(_.getLong(4)).toSeq === Seq(-111111L, -111111L, -111111L))
  }

  test("assortativity: star is perfectly disassortative, cycle degree-regular") {
    val s = spark
    import s.implicits._
    // K1,3: center degree 3, leaves 1 → r = −1 exactly
    val star = Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("src", "dst")
    val r1 = LinkRank.assortativity(star).collect().head
    assert((r1.getLong(0), r1.getLong(1)) === (3L, -1000000L))
    // 4-cycle: every degree 2 → zero variance → pinned 0
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val r2 = LinkRank.assortativity(cyc).collect().head
    assert((r2.getLong(0), r2.getLong(1)) === (4L, 0L))
    // 3-path a−b−c: sym pairs (1,2)(2,1)(2,1)(1,2) → r = −1
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    assert(LinkRank.assortativity(path).collect().head.getLong(1) === -1000000L)
  }

  test("property: modularity and assortativity match in-memory references on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val genCase = for {
      nv <- Gen.chooseNum(3, 18)
      ne <- Gen.chooseNum(2, 40)
      edges <- Gen.listOfN(ne, Gen.zip(
        Gen.chooseNum(0, nv - 1), Gen.chooseNum(0, nv - 1)))
      nc <- Gen.chooseNum(1, 4)
      comm <- Gen.listOfN(nv, Gen.chooseNum(0, nc - 1))
    } yield (edges.map { case (a, b) => (s"n$a", s"n$b") }.filter(e => e._1 != e._2),
      (0 until nv).map(i => s"n$i" -> s"c${comm(i)}").toMap)
    val prop = Prop.forAll(genCase) { case (edges, comm) =>
      edges.isEmpty || {
        val und = edges.map(e => if (e._1 < e._2) e else e.swap).distinct
        val deg = und.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val m = und.size.toLong
        // reference modularity (BigInt truncated division, like div)
        // keys is a SET — force a Seq before mapping to degrees, or
        // equal degrees dedupe and the sum collapses
        val byC = deg.keys.toSeq.groupBy(comm)
        val wantMod = byC.toSeq.map { case (c, vs) =>
          val vset = vs.toSet
          val ec = und.count(e => vset(e._1) && vset(e._2)).toLong
          val dc = vs.map(deg).sum
          val q = (BigInt(1000000) * (BigInt(4) * m * ec - BigInt(dc) * dc) /
            (BigInt(4) * m * m)).toLong
          (c, vs.size.toLong, ec, dc, q)
        }.sortBy(_._1)
        val commDf = comm.toSeq.toDF("domain", "community")
        val gotMod = LinkRank.modularity(
          edges.toDF("src", "dst").repartition(3), commDf)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        // reference assortativity (same double expression + rounding)
        val sym = und.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
        val m2 = sym.size.toLong
        val sx = sym.map(_._1).sum; val sxx = sym.map(p => p._1 * p._1).sum
        val sxy = sym.map(p => p._1 * p._2).sum
        val varx = m2 * sxx - sx * sx
        val wantR =
          if (varx == 0L) 0L
          else math.round((m2 * sxy - sx * sx).toDouble /
            math.sqrt(varx.toDouble * varx.toDouble) * 1000000.0)
        val gotR = LinkRank.assortativity(edges.toDF("src", "dst").repartition(3))
          .collect().head.getLong(1)
        gotMod == wantMod && gotR == wantR
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("modularity of the LPA split is bitwise stable under repartition") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("a", "x")).toDF("src", "dst")
    def run(parts: Int) = {
      val e = edges.repartition(parts)
      LinkRank.modularity(e, LinkRank.labelPropagation(e, iters = 3))
        .collect().toSeq
    }
    assert(run(1) === run(5))
  }
}
