package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/**
 * Batch-native NSW graph ANN: recall grid at the shipped driver-row
 * point (the PcaAnnSpec discipline — the row's oracle is brute force
 * because the shipped point measures recall 1), the beam/iteration
 * gradient that shows the search is genuinely approximate, and the
 * determinism/validation contract.
 */
class NswAnnSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "label",
    vendorCol = "label", descriptionCol = "label")
  private lazy val graph =
    NswAnn.build(emb, "vec_id", "embedding", degree = 16, entries = 8)

  private def qv(id: Int): Array[Float] =
    emb.where(col("vec_id") === id).select("embedding").head.getSeq[Float](0).toArray

  private def bruteIds(q: Array[Float], k: Int): Seq[String] =
    VectorSearch.bruteForce(emb, cfg, q, k, Map.empty, Some(6))
      .select("id").collect().map(_.getString(0)).toSeq

  private def nswIds(g: NswAnn.Graph, q: Array[Float], k: Int, beam: Int,
      maxIters: Int = 12): Seq[Long] =
    NswAnn.topK(emb, "vec_id", "embedding", g, q, k, beam, maxIters)
      .select("id").collect().map(_.getLong(0)).toSeq

  test("shipped point (degree=16, entries=8, beam=64): recall@10 = 1, ordered ≡ brute force") {
    // measured grid at sf0.001 (recall@10 for queries 1/3/7/42):
    //   deg=2,  entries=2, beam=16, iters=12 → 1,4,0,0   (not navigable)
    //   deg=4,  entries=8, beam=10, iters=12 → 1,8,7,1
    //   deg=4,  entries=8, beam=16, iters=12 → 7,8,7,3
    //   deg=16, entries=8, beam=16, iters=12 → 10,10,10,10
    //   deg=16, entries=8, beam=64, iters=12 → 10,10,10,10  ← shipped
    // The shipped row takes beam=64 for margin at sf0.01 (verified
    // green against the brute-force oracle there too).
    Seq(1, 3, 7, 42).foreach { qid =>
      val q = qv(qid)
      val got = NswAnn.topK(emb, "vec_id", "embedding", graph, q,
        k = 10, beam = 64).collect()
        .map(r => (r.getLong(0).toString, r.getDouble(1)))
      val want = VectorSearch.bruteForce(emb, cfg, q, 10, Map.empty, Some(6))
        .select(col("id"), col("score")).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(got.toSeq === want.toSeq, s"query $qid")
    }
  }

  test("recall is monotone in the beam width on a weak (degree 4) graph") {
    val weak = NswAnn.build(emb, "vec_id", "embedding", degree = 4, entries = 8)
    val q = qv(3)
    val want = bruteIds(q, 10).toSet
    val recalls = Seq(10, 16, 48).map { b =>
      nswIds(weak, q, 10, beam = b).map(_.toString).toSet.intersect(want).size
    }
    assert(recalls === recalls.sorted, s"recalls $recalls not monotone")
  }

  test("more hops never hurt: iters gradient on a weak graph") {
    val weak = NswAnn.build(emb, "vec_id", "embedding", degree = 4, entries = 8)
    val q = qv(3)
    val want = bruteIds(q, 10).toSet
    val r2 = nswIds(weak, q, 10, 16, maxIters = 2).map(_.toString).toSet
      .intersect(want).size
    val r12 = nswIds(weak, q, 10, 16, maxIters = 12).map(_.toString).toSet
      .intersect(want).size
    assert(r12 >= r2, s"iters 12 recall $r12 < iters 2 recall $r2")
    assert(r12 > 0)
  }

  test("deterministic: same graph, same query, same rows (twice)") {
    val q = qv(7)
    val a = NswAnn.topK(emb, "vec_id", "embedding", graph, q, 10, 32)
      .collect().map(_.toSeq).toSeq
    val b = NswAnn.topK(emb, "vec_id", "embedding", graph, q, 10, 32)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.size === 10)
  }

  test("entry points are the seeded md5-rank sample — reproducible") {
    val g2 = NswAnn.build(emb, "vec_id", "embedding", degree = 16, entries = 8)
    assert(graph.entryIds === g2.entryIds)
    assert(graph.entryIds.size === 8)
  }

  test("validation: k, beam, degree, entries, maxIters bounds") {
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 0, beam = 8)
    }
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 10, beam = 5)
    }
    intercept[IllegalArgumentException] {
      NswAnn.topK(emb, "vec_id", "embedding", graph, qv(1), k = 1, beam = 1,
        maxIters = 0)
    }
    intercept[IllegalArgumentException] {
      NswAnn.build(emb, "vec_id", "embedding", degree = 0)
    }
    intercept[IllegalArgumentException] {
      NswAnn.build(emb, "vec_id", "embedding", entries = 0)
    }
  }

  test("bucketed at-scale layout: same rows, per-hop probes bucket-prune") {
    // write the adjacency and store as id-bucketed catalog tables (the
    // layout Graph's scaladoc promises) and run the same beam there
    BucketedStore.writeBucketed(graph.adj, "nsw_adj_spec", "id", 8)
    BucketedStore.writeBucketed(emb, "nsw_emb_spec", "vec_id", 8)
    val adjT = spark.table("nsw_adj_spec")
    val embT = spark.table("nsw_emb_spec")
    val q = qv(3)
    val viaDisk = NswAnn.topK(embT, "vec_id", "embedding",
      NswAnn.Graph(adjT, graph.entryIds), q, 10, 64)
      .collect().map(_.toSeq).toSeq
    val viaMem = NswAnn.topK(emb, "vec_id", "embedding", graph, q, 10, 64)
      .collect().map(_.toSeq).toSeq
    assert(viaDisk === viaMem)
    // plan shape: an id-equality probe (the beam's per-hop shape)
    // selects a strict subset of buckets — a point lookup, not a scan.
    // topK pins autoBucketedScan off for its own probes; this
    // standalone probe must do the same to see the pruned plan.
    val AutoBucket = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(AutoBucket, "true")
    spark.conf.set(AutoBucket, "false")
    try {
      val probe = adjT.filter(col("id").isin(graph.entryIds.map(Long.box): _*))
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in plan:\n$plan"))
      assert(m.group(1).toInt < m.group(2).toInt, plan)
      val sProbe = embT.filter(col("vec_id").isin(graph.entryIds.map(Long.box): _*))
      sProbe.collect()
      val sm = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(sProbe.queryExecution.executedPlan.toString)
      assert(sm.exists(x => x.group(1).toInt < x.group(2).toInt))
    } finally spark.conf.set(AutoBucket, prev)
  }

  test("recall degrades monotonically as the graph degree shrinks") {
    // aggregate recall@10 over four queries — per-query recall can
    // wobble on a random graph; the summed gradient is the contract
    // (mirrors the searchTopSize quality knob: smaller index budget
    // never yields better recall)
    val qids = Seq(1, 3, 7, 42)
    val recalls = Seq(2, 4, 16).map { deg =>
      val g = NswAnn.build(emb, "vec_id", "embedding", degree = deg,
        entries = 8)
      qids.map { qid =>
        val q = qv(qid)
        val want = bruteIds(q, 10).toSet
        nswIds(g, q, 10, beam = 16).map(_.toString).toSet
          .intersect(want).size
      }.sum
    }
    assert(recalls === recalls.sorted, s"degree recalls $recalls not monotone")
    assert(recalls.last === 40) // degree 16 is full recall at beam 16
  }

  test("recall degrades monotonically as the entry budget shrinks") {
    val qids = Seq(1, 3, 7, 42)
    val recalls = Seq(1, 4, 8).map { e =>
      val g = NswAnn.build(emb, "vec_id", "embedding", degree = 4,
        entries = e)
      qids.map { qid =>
        val q = qv(qid)
        val want = bruteIds(q, 10).toSet
        nswIds(g, q, 10, beam = 16).map(_.toString).toSet
          .intersect(want).size
      }.sum
    }
    assert(recalls === recalls.sorted, s"entry recalls $recalls not monotone")
  }

  test("append lifecycle: appended graph keeps full recall; entries match a fresh build") {
    val base = emb.where(col("vec_id") < 300)
    val fresh = emb.where(col("vec_id") >= 300)
    val g0 = NswAnn.build(base, "vec_id", "embedding", degree = 16, entries = 8)
    val g1 = NswAnn.append(g0, base, fresh, "vec_id", "embedding",
      degree = 16, entries = 8)
    // queries from the base region AND the appended region
    Seq(1, 3, 7, 42, 310, 450).foreach { qid =>
      val q = qv(qid)
      val got = NswAnn.topK(emb, "vec_id", "embedding", g1, q, 10, 64)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got.map(_.toString) === bruteIds(q, 10), s"query $qid")
    }
    // entry points are the same seeded rank a fresh build computes
    val rebuilt = NswAnn.build(emb, "vec_id", "embedding",
      degree = 16, entries = 8)
    assert(g1.entryIds === rebuilt.entryIds)
    // the old adjacency is preserved verbatim inside the appended graph
    assert(g0.adj.exceptAll(g1.adj).isEmpty)
    // every new node is connected
    val connected = g1.adj.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    val freshIds = fresh.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(freshIds.subsetOf(connected))
  }

  test("delete lifecycle: tombstones hide rows; compaction reproduces the search") {
    val deadDf = emb.where(col("vec_id") % 7 === 3).select("vec_id")
    val dead = deadDf.collect().map(_.getLong(0)).toSet
    val live = emb.where(col("vec_id") % 7 =!= 3)
    val liveCfg = cfg
    Seq(1, 7, 42).foreach { qid =>
      val q = qv(qid)
      // tombstone search over the intact graph == brute force on LIVE
      val viaTomb = NswAnn.topK(emb, "vec_id", "embedding", graph, q,
        10, 64, tombstones = dead)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = VectorSearch.bruteForce(live, liveCfg, q, 10,
        Map.empty, Some(6))
        .select(col("id"), col("score")).collect()
        .map(r => (r.getString(0).toLong, r.getDouble(1))).toSeq
      assert(viaTomb === want, s"query $qid tombstones")
      // no tombstoned id ever emitted, AND the tombstone actually did
      // something: the unfiltered search must rank >= 1 deleted id
      assert(viaTomb.forall(t => !dead(t._1)))
      val unfiltered = NswAnn.topK(emb, "vec_id", "embedding", graph, q,
        10, 64).collect().map(_.getLong(0)).toSeq
      assert(unfiltered.exists(dead), s"query $qid: no dead id in " +
        s"unfiltered top-10 - the fixture does not exercise the filter")
      // compaction: edges dropped, neighbors reconnected, store live
      val compacted = NswAnn.compact(live, "vec_id", graph, deadDf, "vec_id")
      val viaCompact = NswAnn.topK(live, "vec_id", "embedding",
        compacted, q, 10, 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaCompact === want, s"query $qid compacted")
    }
    val compacted = NswAnn.compact(live, "vec_id", graph, deadDf, "vec_id")
    // no deleted id survives in the compacted adjacency, either side
    val ids = compacted.adj.select("id").unionByName(
      compacted.adj.select(col("nbr_id").as("id")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids.intersect(dead).isEmpty)
    assert(compacted.entryIds.forall(e => !dead(e)))
  }

  test("randomized churn: append/delete/compact keeps brute-force parity, never resurrects tombstones") {
    // Lifecycle property (the IVF tombstone-churn discipline applied
    // to the graph index): under random append → tombstone → compact
    // sequences the search stays EXACT at the shipped grid point
    // (degree 16, beam 64 ≡ brute force over the live rows — recall 1,
    // the same bar the deterministic lifecycle tests pin), and an id
    // deleted at any point never reappears in any later result,
    // before OR after the compaction that physically removes it.
    val allIds = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    def df(ids: Set[Long]) =
      emb.where(col("vec_id").isInCollection(ids.map(Long.box)))
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // base = random 60–80% of the corpus; the rest arrives in
      // append batches of random size
      val shuffled = rnd.shuffle(allIds.toVector)
      val baseCut = (shuffled.size * (0.6 + 0.2 * rnd.nextDouble())).toInt
      var present = shuffled.take(baseCut).toSet
      var pool = shuffled.drop(baseCut)
      var g = NswAnn.build(df(present), "vec_id", "embedding",
        degree = 16, entries = 8)
      var dead = Set.empty[Long] // tombstoned, still routable in graph
      var deletedEver = Set.empty[Long]
      def check(label: String): Unit = {
        val liveIds = present -- dead
        val qid = liveIds.toSeq.sorted.apply(rnd.nextInt(liveIds.size))
        val q = qv(qid.toInt)
        val got = NswAnn.topK(df(present), "vec_id", "embedding", g, q,
          10, 64, tombstones = dead)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val want = VectorSearch.bruteForce(df(liveIds), cfg, q, 10,
          Map.empty, Some(6))
          .select(col("id"), col("score")).collect()
          .map(r => (r.getString(0).toLong, r.getDouble(1))).toSeq
        assert(got === want, s"seed $seed $label query $qid")
        assert(got.forall(t => !deletedEver(t._1)),
          s"seed $seed $label: resurrected tombstoned id")
      }
      check("base")
      for (op <- 1 to 3) {
        val r = rnd.nextInt(3)
        if (r == 0 && pool.nonEmpty) { // append a random batch
          val take = math.min(pool.size, 20 + rnd.nextInt(60))
          val batch = pool.take(take).toSet
          pool = pool.drop(take)
          g = NswAnn.append(g, df(present), df(batch), "vec_id",
            "embedding", degree = 16, entries = 8)
          present ++= batch
        } else if (r == 1) { // tombstone ~1/8 of the live rows
          val live = (present -- dead).toVector.sorted
          val kill = rnd.shuffle(live).take(math.max(1, live.size / 8)).toSet
          dead ++= kill
          deletedEver ++= kill
        } else if (dead.nonEmpty) { // compact the tombstones away
          g = NswAnn.compact(df(present -- dead), "vec_id", g,
            df(dead), "vec_id")
          present --= dead
          dead = Set.empty
        }
        check(s"op $op")
      }
    }
  }

  test("compaction bridges ADJACENT deleted nodes (live-d1-d2-live path)") {
    import spark.implicits._
    // a 4-node chain a-d1-d2-b where d1, d2 both die: per-node repair
    // would clique each node's own live boundary ({a} and {b}) and
    // sever the path; per-COMPONENT repair must emit a-b
    val adj = Seq(
      (10L, 11L), (11L, 10L), // a - d1
      (11L, 12L), (12L, 11L), // d1 - d2
      (12L, 13L), (13L, 12L)) // d2 - b
      .toDF("id", "nbr_id")
    val liveIds = Seq(10L, 13L).toDF("vec_id")
    val deadIds = Seq(11L, 12L).toDF("vec_id")
    val g = NswAnn.Graph(adj, Seq(10L))
    val compacted = NswAnn.compact(liveIds, "vec_id", g, deadIds, "vec_id")
    val edges = compacted.adj.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((10L, 13L), (13L, 10L)))
    assert(compacted.entryIds.toSet.subsetOf(Set(10L, 13L)))
  }
}
