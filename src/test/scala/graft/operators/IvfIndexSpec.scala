package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val store = emb.join(docs, col("vec_id") === col("doc_id"))
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
    vendorCol = "lang", descriptionCol = "text")

  private def qv(id: Int): Array[Float] =
    emb.where(col("vec_id") === id).select("embedding").head.getSeq[Float](0).toArray

  private lazy val built = IvfIndex.build(store, "embedding", numClusters = 8)

  test("full breadth (searchTopSize = numClusters) equals brute force exactly") {
    val (assigned, model) = built
    val ivf = IvfIndex.search(assigned, model, cfg, qv(1), k = 10,
      searchTopSize = model.numClusters, scoreScale = Some(6)).collect()
    val brute = VectorSearch.bruteForce(store, cfg, qv(1), 10, Map.empty, Some(6))
      .collect()
    assert(ivf.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
  }

  test("recall@10 is monotonically non-decreasing in searchTopSize") {
    val (assigned, model) = built
    val truth = VectorSearch.bruteForce(store, cfg, qv(2), 10).collect()
      .map(_.getString(0)).toSet
    val recalls = Seq(1, 2, 4, 8).map { ts =>
      val got = IvfIndex.search(assigned, model, cfg, qv(2), 10, ts).collect()
        .map(_.getString(0)).toSet
      (got intersect truth).size.toDouble / truth.size
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a })
    assert(recalls.last === 1.0) // full breadth = exact
  }

  test("pruning actually prunes: topSize=1 scans a single cluster") {
    val (assigned, model) = built
    val top1 = model.rankClusters(qv(3), cfg.strategy).take(1)
    val clusterSize = assigned.filter(col(IvfIndex.ClusterCol) === top1(0)).count()
    assert(clusterSize < assigned.count()) // strictly fewer rows scanned
    val got = IvfIndex.search(assigned, model, cfg, qv(3), 10, 1).collect()
    assert(got.length <= 10 && got.nonEmpty)
  }

  test("searchTopSize validation (app.py:373-375 parity)") {
    val (assigned, model) = built
    intercept[IllegalArgumentException] {
      IvfIndex.search(assigned, model, cfg, qv(0), 10, 0)
    }
  }

  test("2-level tree: full breadth equals brute force exactly") {
    val (assigned, model) = built
    val tree = IvfIndex.buildTree(model, macroClusters = 3)
    val got = IvfIndex.searchTree(assigned, tree, cfg, qv(4), k = 10,
      searchTopSize = model.numClusters, scoreScale = Some(6)).collect()
    val brute = VectorSearch.bruteForce(store, cfg, qv(4), 10, Map.empty, Some(6)).collect()
    assert(got.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
  }

  test("2-level tree: recall@10 monotone in searchTopSize; breadth bounds candidates") {
    val (assigned, model) = built
    val tree = IvfIndex.buildTree(model, macroClusters = 3)
    val truth = VectorSearch.bruteForce(store, cfg, qv(5), 10).collect()
      .map(_.getString(0)).toSet
    val recalls = Seq(1, 2, 4, 8).map { ts =>
      assert(tree.candidateClusters(qv(5), cfg.strategy, ts).length <= ts)
      val got = IvfIndex.searchTree(assigned, tree, cfg, qv(5), 10, ts).collect()
        .map(_.getString(0)).toSet
      (got intersect truth).size.toDouble / truth.size
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a }, recalls.toString)
    assert(recalls.last === 1.0)
  }

  test("partitioned write: store written by cluster_id enables partition pruning") {
    val (assigned, model) = built
    val path = java.nio.file.Files.createTempDirectory("ivf_store").toString
    IvfIndex.writePartitioned(assigned, path)
    val reread = spark.read.parquet(path)
    val top = model.rankClusters(qv(0), cfg.strategy).take(2)
    val pruned = reread.filter(col(IvfIndex.ClusterCol)
      .isin(top.map(Integer.valueOf): _*))
    // partition filter must appear in the scan (PartitionFilters), i.e.
    // pruning happens at file-listing time, not post-scan.
    val scanStr = pruned.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("cluster_id"), scanStr)
    assert(pruned.count() > 0)
  }

  test("assignBatch picks the argmin-L2 centroid per row (matches driver math)") {
    val (_, model) = built
    val batch = store.filter(col("vec_id") < 50)
    val got = IvfIndex.assignBatch(batch, "embedding", model)
      .select(col("vec_id"), col(IvfIndex.ClusterCol))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    batch.select("vec_id", "embedding").collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val expected = model.centroids.indices.minBy(c =>
        IvfMath.score(SearchStrategy.EuclideanDistance, v, model.centroids(c)))
      assert(got(r.getLong(0)) === expected, s"vec ${r.getLong(0)}")
    }
  }

  test("append maintenance: full-breadth search over base ∪ appended equals brute force") {
    val (a, model) = IvfIndex.build(store.filter(col("vec_id") < 300), "embedding", 8)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_append_spec").toString
    IvfIndex.writePartitioned(a, path)
    IvfIndex.appendPartitioned(
      IvfIndex.assignBatch(store.filter(col("vec_id") >= 300), "embedding", model), path)
    val merged = spark.read.parquet(path)
    assert(merged.count() === store.count()) // nothing lost or duplicated
    val ivf = IvfIndex.search(merged, model, cfg, qv(3), k = 10,
      searchTopSize = model.numClusters, scoreScale = Some(6)).collect()
    val brute = VectorSearch.bruteForce(store, cfg, qv(3), 10, Map.empty, Some(6))
      .collect()
    assert(ivf.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
  }

  test("tombstone search: deleted ids excluded, equals brute force over live rows") {
    val (assigned, model) = built
    val tombstones = store.filter(col("vec_id") % 7 === 3).select("vec_id")
    val deleted = tombstones.collect().map(_.getLong(0)).toSet
    val got = IvfIndex.searchWithTombstones(assigned, model, cfg, qv(5),
      k = 10, searchTopSize = model.numClusters,
      tombstones = tombstones, idCol = "vec_id", scoreScale = Some(6)).collect()
    assert(got.forall(r => !deleted.contains(r.getString(0).toLong)))
    val brute = VectorSearch.bruteForce(
      store.filter(col("vec_id") % 7 =!= 3), cfg, qv(5), 10, Map.empty, Some(6))
      .collect()
    assert(got.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
  }

  test("tombstone anti-join is broadcast, not shuffled") {
    val (assigned, model) = built
    val tombstones = store.filter(col("vec_id") % 7 === 3).select("vec_id")
    val plan = IvfIndex.searchWithTombstones(assigned, model, cfg, qv(5),
      k = 10, searchTopSize = 2, tombstones = tombstones, idCol = "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("search after compaction equals tombstoned search before (with and without reassign)") {
    val (assigned, model) = built
    val tombstones = store.filter(col("vec_id") % 7 === 3).select("vec_id")
    val before = IvfIndex.searchWithTombstones(assigned, model, cfg, qv(6),
      k = 10, searchTopSize = model.numClusters,
      tombstones = tombstones, idCol = "vec_id", scoreScale = Some(6)).collect()
    for (reassign <- Seq(None, Some(model))) {
      val path = java.nio.file.Files
        .createTempDirectory("graft_ivf_compact_spec").toString
      IvfIndex.compact(assigned, tombstones, "vec_id", path,
        embCol = "embedding", reassign = reassign)
      val compacted = spark.read.parquet(path)
      // tombstoned rows are physically gone from the new generation
      assert(compacted.count() ===
        store.filter(col("vec_id") % 7 =!= 3).count())
      assert(compacted.filter(col("vec_id") % 7 === 3).count() === 0L)
      val after = IvfIndex.search(compacted, model, cfg, qv(6), k = 10,
        searchTopSize = model.numClusters, scoreScale = Some(6)).collect()
      assert(after.map(_.toSeq).toSeq === before.map(_.toSeq).toSeq,
        s"reassign=${reassign.isDefined}")
    }
  }

  test("catalog: old generation readable until swap; vacuum reclaims it after") {
    val (assigned, model) = built
    val catalog = java.nio.file.Files
      .createTempDirectory("graft_ivf_catalog_spec").toString
    // generation 0: the full store
    val g0 = IvfCatalog.nextGenerationName(spark, catalog)
    assert(g0 === "gen-0")
    IvfIndex.writePartitioned(assigned, s"$catalog/$g0")
    assert(IvfCatalog.swapGeneration(spark, catalog, g0) === None)
    val n0 = IvfCatalog.readCurrent(spark, catalog).count()
    assert(n0 === store.count())
    // compaction writes generation 1 — CURRENT still points at gen-0,
    // so readers are unaffected until the swap
    val tombstones = store.filter(col("vec_id") % 7 === 3).select("vec_id")
    val g1 = IvfCatalog.nextGenerationName(spark, catalog)
    assert(g1 === "gen-1")
    IvfIndex.compact(assigned, tombstones, "vec_id", s"$catalog/$g1")
    assert(IvfCatalog.current(spark, catalog) === Some("gen-0"))
    assert(IvfCatalog.readCurrent(spark, catalog).count() === n0)
    // vacuum before any superseding swap must not delete gen-1 (it is
    // not provably superseded — the pointer still names gen-0)
    assert(IvfCatalog.vacuum(spark, catalog) === Seq("gen-1"))
    // rebuild gen-1 and swap: readers flip, gen-0 becomes garbage
    IvfIndex.compact(assigned, tombstones, "vec_id", s"$catalog/gen-1")
    assert(IvfCatalog.swapGeneration(spark, catalog, "gen-1") === Some("gen-0"))
    val liveCount = store.filter(col("vec_id") % 7 =!= 3).count()
    assert(IvfCatalog.readCurrent(spark, catalog).count() === liveCount)
    assert(IvfCatalog.vacuum(spark, catalog) === Seq("gen-0"))
    assert(IvfCatalog.generations(spark, catalog) === Seq("gen-1"))
    assert(!new java.io.File(s"$catalog/gen-0").exists())
    // the current generation survives vacuum and stays readable
    assert(IvfCatalog.readCurrent(spark, catalog).count() === liveCount)
    // swapping to a missing generation is refused
    intercept[IllegalArgumentException] {
      IvfCatalog.swapGeneration(spark, catalog, "gen-9")
    }
  }

  test("catalog: vacuum refuses to run before any swap") {
    val catalog = java.nio.file.Files
      .createTempDirectory("graft_ivf_catalog_nopin").toString
    intercept[IllegalStateException] { IvfCatalog.vacuum(spark, catalog) }
  }

  test("property: tombstoned search ≡ brute force under append/delete/compact churn") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // deterministic tiny universe: dim-4 vectors derived from the id
    def vec(id: Long): Seq[Float] = {
      val h = graft.functions.TextHashKernels.splitMix64(id)
      Seq.tabulate(4)(d => ((((h >>> (d * 13)) & 0xffffL).toFloat / 65535f) * 2f) - 1f)
    }
    def rows(ids: Seq[Long]) = ids
      .map(id => (id, s"t$id", s"v$id", s"d$id", vec(id)))
      .toDF("vec_id", "source", "lang", "text", "embedding")
    def tombDf(ids: Set[Long]) = ids.toSeq.sorted.toDF("vec_id")
    val baseIds = 0L until 30L
    val (assignedBase, churnModel) =
      IvfIndex.build(rows(baseIds), "embedding", numClusters = 4)
    assignedBase.persist()
    try {
      sealed trait Op
      case class Append(n: Int) extends Op
      case class Delete(ids: Seq[Long]) extends Op
      case object Compact extends Op
      // deletes sample base ids, appended-range ids, and absent ids —
      // tombstones of rows that never existed must be harmless
      val delId = Gen.oneOf(
        Gen.chooseNum(0L, 29L), Gen.chooseNum(100L, 130L))
      val genOp: Gen[Op] = Gen.frequency(
        3 -> Gen.chooseNum(1, 6).map(Append.apply),
        4 -> Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, delId)).map(Delete.apply),
        2 -> Gen.const(Compact))
      val genScript = for {
        nOps <- Gen.chooseNum(1, 6)
        ops <- Gen.listOfN(nOps, genOp)
        qseed <- Gen.chooseNum(0L, 5000L)
      } yield (ops, qseed)
      val prop = Prop.forAll(genScript) { case (ops, qseed) =>
        // mirror of the store's semantics: `present` = ids physically in
        // the store, `tomb` = active tombstones. Tombstones are a SET,
        // not an event log — a tombstone laid down before its id is
        // appended still hides the row (the classic resurrection rule),
        // so live = present − tomb at evaluation time, never a running
        // insert-order account.
        var storeDf = assignedBase.toDF()
        var tomb = Set.empty[Long]
        var present = baseIds.toSet
        var nextId = 100L
        ops.foreach {
          case Append(n) =>
            val ids = nextId until (nextId + n); nextId += n
            storeDf = storeDf.unionByName(
              IvfIndex.assignBatch(rows(ids.toSeq), "embedding", churnModel))
            present ++= ids
          case Delete(ids) =>
            tomb ++= ids
          case Compact =>
            // the compaction algebra without the parquet round-trip:
            // tombstones are applied to the store and then truncated
            // (the write path itself is covered by the example-based
            // compaction + catalog tests above)
            storeDf = storeDf.join(broadcast(tombDf(tomb)),
              Seq("vec_id"), "left_anti")
            present --= tomb
            tomb = Set.empty
        }
        val live = present -- tomb
        val q = vec(qseed).toArray
        val got = IvfIndex.searchWithTombstones(storeDf, churnModel, cfg, q,
          k = 8, searchTopSize = churnModel.numClusters,
          tombstones = tombDf(tomb), idCol = "vec_id", scoreScale = Some(6))
          .collect().map(_.toSeq).toSeq
        val want = VectorSearch.bruteForce(rows(live.toSeq.sorted), cfg, q,
          8, Map.empty, Some(6)).collect().map(_.toSeq).toSeq
        got == want
      }
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
      assert(res.passed, s"churn property: ${res.status}")
    } finally assignedBase.unpersist()
  }
}
