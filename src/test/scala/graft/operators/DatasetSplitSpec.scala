package graft.operators

import graft.SparkFunSuite
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class DatasetSplitSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5Bucket(id: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
  }

  test("bucket matches an independent md5 computation per row") {
    val got = DatasetSplit.assignSplits((0L until 50L).toDF("id"), "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    (0L until 50L).foreach { id =>
      assert(got(id) === md5Bucket(id.toString), s"id=$id")
    }
  }

  test("assignment is a pure function of the id: stable across partitionings and order") {
    val ids = (0L until 300L).toDF("id")
    val a = DatasetSplit.assignSplits(ids.repartition(1), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = DatasetSplit.assignSplits(ids.orderBy(rand(7)).repartition(13), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("shuffleOrder: (shard, pos) is a permutation — contiguous positions per shard") {
    import spark.implicits._
    val got = DatasetSplit.shuffleOrder((0L until 500L).toDF("id"), "id", numShards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(got.length === 500)
    assert(got.map(_._1).toSet.size === 500) // every row exactly once
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 8)
      // positions within a shard are exactly 1..count
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, s"shard=$shard")
    }
  }

  test("shuffleOrder is deterministic across partitionings and row order") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("id")
    val a = DatasetSplit.shuffleOrder(ids.repartition(1), "id", numShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = DatasetSplit.shuffleOrder(ids.orderBy(rand(3)).repartition(11), "id", numShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("shuffleOrder: different seeds give different permutations, same seed the same") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("id")
    def order(seed: String) =
      DatasetSplit.shuffleOrder(ids, "id", numShards = 4, seed = seed)
        .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
        .sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(order("s1") === order("s1"))
    assert(order("s1") !== order("s2"))
  }

  test("split proportions track the cut points on a large id range") {
    val n = 20000L
    val counts = DatasetSplit.assignSplits(spark.range(n).toDF("id"), "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === n)
    // md5 buckets are uniform; allow ±3 percentage points
    assert(math.abs(counts("train").toDouble / n - 0.80) < 0.03)
    assert(math.abs(counts("val").toDouble / n - 0.10) < 0.03)
    assert(math.abs(counts("test").toDouble / n - 0.10) < 0.03)
  }

  test("vector_normalize yields unit norm; zero/empty/malformed go null") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Array(3f, 4f)),
      (2L, Array(0f, 0f)),
      (3L, Array.empty[Float])).toDF("id", "v")
    val out = rows.select(col("id"), GraftFunctions.vectorNormalize(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).isEmpty && out(3L).isEmpty)
    val n1 = out(1L).get.asInstanceOf[scala.collection.Seq[Double]]
    assert(n1.toSeq === Seq(0.6, 0.8))
    // binary wire-format input takes the same path
    val viaBinary = rows.filter(col("id") === 1L)
      .select(GraftFunctions.vectorNormalize(
        GraftFunctions.toBinaryVector(col("v"))).as("n"))
      .head.getSeq[Double](0)
    assert(viaBinary === Seq(0.6, 0.8))
  }

  test("stratifiedSample: rate 100 keeps all, 0/unlisted drop all, partial rates subset") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val kept = DatasetSplit.stratifiedSample(df, "id", "src",
        Map("src0" -> 100, "src1" -> 40, "src2" -> 0))
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") === 100) // every src0 row survives
    assert(!bySrc.contains("src2") && !bySrc.contains("src3")) // 0% and unlisted drop
    assert(bySrc("src1") > 20 && bySrc("src1") < 60) // ~40% of 100
    // survivors are exactly the rows whose bucket clears the rate
    kept.filter(_._2 == "src1").foreach { case (id, _) =>
      assert(md5Bucket(id.toString) < 40)
    }
  }

  test("balancedSample prefilter path is exact: equals the naive rank for every pct") {
    // big stratum (survives the prefilter) + tiny stratum (forced
    // through the short-stratum fallback) + seeds varying hash layout
    val df = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "tiny"))).toDF("id", "src")
    val naive = DatasetSplit.balancedSample(df, "id", "src", n = 12)
      .select("id", "src", "pick_rank").as[(Long, String, Long)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    for (pct <- Seq(5, 20, 60, 100)) {
      val two = DatasetSplit.balancedSample(df, "id", "src", n = 12,
        prefilterPct = Some(pct))
        .select("id", "src", "pick_rank").as[(Long, String, Long)]
        .collect().sortBy(r => (r._2, r._3)).toSeq
      assert(two === naive, s"pct=$pct")
    }
  }

  test("balancedSample: a NULL stratum routes identically on both paths") {
    // A null stratum is one window partition on the None path; the
    // prefilter path must carry it through its (null-safe) stratum
    // joins rather than silently dropping every null-stratum row.
    val df = ((0L until 200L).map(i => (i, if (i % 2 == 0) "a" else null)))
      .toDF("id", "src")
    val naive = DatasetSplit.balancedSample(df, "id", "src", n = 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(naive.nonEmpty)
    for (pct <- Seq(10, 50, 100)) {
      val pre = DatasetSplit.balancedSample(df, "id", "src", n = 7,
        prefilterPct = Some(pct))
      assert(pre.select("id").as[Long].collect().sorted.toSeq === naive,
        s"pct=$pct")
      assert(pre.filter(col("src").isNull).count() === 7L, s"pct=$pct")
    }
  }

  test("shardKey matches shuffleOrder's shard for every row") {
    val df = (0L until 300L).toDF("id")
    val mismatch = DatasetSplit.shuffleOrder(df, "id", numShards = 16)
      .withColumn("k", DatasetSplit.shardKey(col("id"), 16))
      .filter(col("k") =!= col("shard"))
    assert(mismatch.isEmpty)
  }

  test("balancedSample: exactly n per stratum, small strata whole, rank order by seeded md5") {
    val df = ((0L until 100L).map(i => (i, "big")) ++
      Seq((200L, "tiny"), (201L, "tiny"))).toDF("id", "src")
    val got = DatasetSplit.balancedSample(df, "id", "src", n = 10)
      .select("id", "src", "pick_rank").as[(Long, String, Long)].collect()
    val byStr = got.groupBy(_._2)
    assert(byStr("big").length === 10)
    assert(byStr("tiny").length === 2)           // smaller than n → all rows
    // ranks are 1..n and follow the seeded-md5 string order
    val bigSorted = byStr("big").sortBy(_._3)
    assert(bigSorted.map(_._3).toSeq === (1L to 10L))
    val hx = (id: Long) => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(bigSorted.map(_._1).toSeq ===
      (0L until 100L).sortBy(id => (hx(id), id)).take(10))
    // deterministic across repartitionings
    val again = DatasetSplit.balancedSample(df.repartition(7), "id", "src", n = 10)
      .select("id").as[Long].collect().sorted
    assert(again.toSeq === got.map(_._1).sorted.toSeq)
  }

  test("packSequences: hand-computed offsets, pack cuts, per-shard streams") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), (4L, "a", 10L),
      (5L, "b", 300L), (6L, "b", 1L))
      .toDF("id", "shard", "n")
    val got = SequencePacking.packSequences(docs, "shard", "id", "n", ctxLen = 256)
      .select("id", "stream_offset", "pack_id", "pack_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 0L),     // shard a stream: 0, 100, 200, 300
      (2L, 100L, 0L, 100L),
      (3L, 200L, 0L, 200L),
      (4L, 300L, 1L, 44L),  // crosses into the second 256-window
      (5L, 0L, 0L, 0L),     // shard b restarts its own stream
      (6L, 300L, 1L, 44L)))
  }

  test("packSequences is invariant to input partitioning and row order") {
    val docs = (0L until 200L).map(i => (i, s"s${i % 3}", (i % 37) + 1)).toDF("id", "shard", "n")
    val a = SequencePacking.packSequences(docs.repartition(1), "shard", "id", "n", 64)
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = SequencePacking.packSequences(
        docs.orderBy(rand(5)).repartition(9), "shard", "id", "n", 64)
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("unit-norm store makes inner product equal cosine (the scan fast path)") {
    GraftFunctions.register(spark)
    val rows = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(-4f, 0f, 2f)))
      .toDF("id", "v")
      .withColumn("nv", GraftFunctions.vectorNormalize(col("v")).cast("array<float>"))
    val q = Array(0.5f, -1f, 2f)
    val both = rows.select(
      round(GraftFunctions.knnCosineSimilarity(col("v"), typedlit(q)), 6).as("cos"),
      round(GraftFunctions.knnInnerProductSimilarity(col("nv"),
        GraftFunctions.vectorNormalize(typedlit(q)).cast("array<float>")), 6).as("ip"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 2e-6,
        s"cos=${r.getDouble(0)} ip=${r.getDouble(1)}")
    }
  }

  test("priorityEstimate: population <= k is exact (tau = 0)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
    val r = DatasetSplit.priorityEstimate(df, "id", "w", k = 5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === (5L, 3L, 60L, 60L, 0L))
  }

  test("priorityEstimate matches a driver-side DLT replay and is partition-stable") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map(i => (i.toLong, 1L + (i * 37L) % 500))
    // independent replay of the pinned integer priorities
    def u16(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"graft:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 4), 16)
    }
    val pri = rows.map { case (id, w) => (id, w, (w * 65536L) / (u16(id) + 1L)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = pri(50)._3
    val want = pri.take(50).map { case (_, w, _) => math.max(w, tau) }.sum
    val got = DatasetSplit.priorityEstimate(
      rows.toDF("id", "w").repartition(7), "id", "w", k = 50).collect().head
    assert(got.getLong(3) === want)
    assert(got.getLong(2) === rows.map(_._2).sum)
    // the 50-row sample estimates the 200-row total within ~25%
    assert(math.abs(got.getLong(3) - got.getLong(2)).toDouble
      / got.getLong(2) < 0.25)
    val again = DatasetSplit.priorityEstimate(
      rows.toDF("id", "w").repartition(1), "id", "w", k = 50).collect().head
    assert(again === got)
  }

  test("leakageCard: cross-split pairs flag leaked, same-split pairs don't") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("a_id", "b_id")
    val splits = Seq((1L, "train"), (2L, "train"), (3L, "test"),
      (4L, "val"), (5L, "train")).toDF("doc_id", "split")
    val got = DatasetSplit.leakageCard(pairs, "a_id", "b_id",
      splits, "doc_id", "split")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("train", "test", 2L, true),
      ("train", "train", 1L, false),
      ("val", "train", 1L, true)))
  }

  test("leakageCard: empty pair relation yields an empty card, not a crash") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val splits = Seq((1L, "train")).toDF("doc_id", "split")
    assert(DatasetSplit.leakageCard(pairs, "a_id", "b_id",
      splits, "doc_id", "split").count() === 0L)
  }
}
