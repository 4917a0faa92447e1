package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Count–Min Sketch: one-sided error (estimate ≥ truth), exactness
  * without collisions, collision over-count with a forced tiny width,
  * partitioning invariance, and sketch size bound. */
class SketchesSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = Seq(
    "a a a b c", "b c d", "a d d e", "e e e e"
  ).toDF("text")

  private def exact: Map[String, Long] =
    CountMinSketch.termCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimate >= exact for every term, any width") {
    for (width <- Seq(2, 16, 256)) {
      val sketch = CountMinSketch.build(docs, "text", depth = 4, width = width)
      val est = CountMinSketch.estimate(sketch,
        exact.keys.toSeq.toDF("term"), depth = 4, width = width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"width=$width term=$t est=${est(t)} exact=$c")
      }
    }
  }

  test("wide sketch with 5 terms is collision-free: estimate == exact") {
    val sketch = CountMinSketch.build(docs, "text", depth = 4, width = 256)
    val est = CountMinSketch.estimate(sketch,
      exact.keys.toSeq.toDF("term"), depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5 terms in 4×256 cells: P(any term colliding in ALL 4 rows) ~ 0;
    // the seeds are fixed, so this is a deterministic fact, not a flake
    assert(est === exact)
  }

  test("unseen term estimates 0 (absent cells) or collides upward only") {
    val sketch = CountMinSketch.build(docs, "text", depth = 4, width = 256)
    val est = CountMinSketch.estimate(sketch, Seq("zzz").toDF("term"), 4, 256)
      .collect().head.getLong(1)
    assert(est === 0L)
  }

  test("sketch relation is bounded by depth x width and invariant to partitioning") {
    val s1 = CountMinSketch.build(docs, "text", depth = 3, width = 8)
    assert(s1.count() <= 3L * 8)
    val s2 = CountMinSketch.build(docs.repartition(7), "text", depth = 3, width = 8)
    assert(s1.orderBy("j", "bucket").collect().toSeq ===
      s2.orderBy("j", "bucket").collect().toSeq)
  }

  test("CMS under streaming aggregation: final cells equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    // the sketch build IS a grouped sum, so it runs unchanged as a
    // streaming aggregation in complete mode — the incremental sketch
    // a live ingest keeps warm
    val input = MemoryStream[String]
    val cells = (0 until 3).map(j =>
      struct(lit(j).as("j"), CountMinSketch.bucket(col("term"), j, 8).as("bucket")))
    val q = input.toDF().select(explode(split(col("value"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val texts = docs.collect().map(_.getString(0))
      input.addData(texts.take(2)); q.processAllAvailable()
      input.addData(texts.drop(2)); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batch = CountMinSketch.build(docs, "text", depth = 3, width = 8)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  // ------------------------------------------------------- bottom-k

  private def srcDocs(rows: (String, String)*) = rows.toDF("source", "text")

  test("bottom-k: identical sources estimate 1.0; disjoint estimate 0.0") {
    val df = BottomKSketch.pairwiseJaccard(srcDocs(
      ("a", "x1"), ("a", "x2"), ("b", "x1"), ("b", "x2"),
      ("c", "y1"), ("c", "y2")), "source", "text", k = 8)
      .orderBy("src_a", "src_b").collect()
    val byPair = df.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getDouble(4), r.getDouble(7)))).toMap
    assert(byPair(("a", "b")) === ((1.0, 1.0)))
    assert(byPair(("a", "c")) === ((0.0, 0.0)))
    assert(byPair(("b", "c")) === ((0.0, 0.0)))
  }

  test("bottom-k: k >= |union| makes the estimate exact; hand-computed overlap") {
    // a = {1,2,3,4}, b = {3,4,5,6}: J = 2/6
    val df = BottomKSketch.pairwiseJaccard(srcDocs(
      ("a", "1"), ("a", "2"), ("a", "3"), ("a", "4"),
      ("b", "3"), ("b", "4"), ("b", "5"), ("b", "6")), "source", "text", k = 16)
      .collect().head
    assert(df.getAs[Long]("est_num") === 2L)
    assert(df.getAs[Long]("m_size") === 6L)
    assert(df.getAs[Long]("inter") === 2L)
    assert(df.getAs[Long]("uni") === 6L)
    assert(df.getAs[Double]("est_jaccard") === 2.0 / 6.0)
    assert(df.getAs[Double]("exact_jaccard") === 2.0 / 6.0)
  }

  test("bottom-k: small k bounds the sketch; estimate stays in [0,1] and is deterministic") {
    val rows = (0 until 40).map(i => ("a", s"t$i")) ++
      (20 until 60).map(i => ("b", s"t$i"))
    val r1 = BottomKSketch.pairwiseJaccard(srcDocs(rows: _*), "source", "text", k = 8)
      .collect().head
    assert(r1.getAs[Long]("m_size") === 8L)
    val e = r1.getAs[Double]("est_jaccard")
    assert(e >= 0.0 && e <= 1.0)
    val r2 = BottomKSketch.pairwiseJaccard(
      srcDocs(scala.util.Random.shuffle(rows): _*).repartition(5),
      "source", "text", k = 8).collect().head
    assert(r2.getAs[Long]("est_num") === r1.getAs[Long]("est_num"))
    assert(r2.getAs[Double]("est_jaccard") === e)
  }

  // ----------------------------------------------------------- HLL

  test("hll: registers are (bucket 0..255, rho 1..49); deterministic under repartition") {
    val df = (0 until 500).map(i => s"k$i").toDF("k")
    val regs = HyperLogLog.registers(df, "k").collect()
    assert(regs.nonEmpty && regs.length <= 256)
    regs.foreach { r =>
      val b = r.getInt(0); val rho = r.getInt(1)
      assert(b >= 0 && b < 256, s"bucket $b")
      assert(rho >= 1 && rho <= 49, s"rho $rho")
    }
    val again = HyperLogLog.registers(df.repartition(7), "k").collect()
    assert(regs.map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq ===
      again.map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq)
  }

  test("hll: rho matches an independent bit-count of the md5 window") {
    val keys = (0 until 64).map(i => s"key-$i")
    val regs = HyperLogLog.registers(keys.toDF("k"), "k").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    // independent reconstruction: JDK MessageDigest, BigInteger bit math
    val md = java.security.MessageDigest.getInstance("MD5")
    val byBucket = scala.collection.mutable.Map.empty[Int, Int]
    keys.foreach { k =>
      val hex = md.digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(0, 2), 16)
      val w = new java.math.BigInteger(hex.substring(2, 14), 16)
      val rho = if (w.signum == 0) 49 else 48 - w.bitLength + 1
      byBucket(bucket) = math.max(byBucket.getOrElse(bucket, 0), rho)
    }
    assert(regs === byBucket.toMap)
  }

  test("hll: estimate within 3 standard errors of truth (n=2000)") {
    val df = (0 until 2000).map(i => s"user-$i").toDF("k")
    val row = HyperLogLog.estimateWithTruth(df, "k").collect().head
    val est = row.getAs[Double]("est_distinct")
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact === 2000L)
    // sigma ~ 1.04/sqrt(256) ~ 6.5% relative
    assert(math.abs(est - exact) <= 3 * 0.065 * exact,
      s"est=$est exact=$exact")
  }

  test("hll: sketches merge by per-register max (union = merged estimate)") {
    val a = (0 until 300).map(i => s"u$i").toDF("k")
    val b = (150 until 450).map(i => s"u$i").toDF("k")
    val merged = HyperLogLog.registers(a, "k")
      .unionByName(HyperLogLog.registers(b, "k"))
      .groupBy("bucket").agg(max("rho").as("rho"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    val direct = HyperLogLog.registers(a.unionByName(b), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(merged === direct)
  }

  test("hll: empty input estimates 0 with all registers empty") {
    val empty = Seq.empty[String].toDF("k")
    val row = HyperLogLog.estimateWithTruth(empty, "k").collect().head
    assert(row.getAs[Int]("m") === 256)
    assert(row.getAs[Long]("v_zero") === 256L)
    assert(row.getAs[Double]("est_distinct") === 0.0)
    assert(row.getAs[Long]("exact_distinct") === 0L)
  }

  test("hll per-group: merge(old, delta) == direct build; estimates follow") {
    // 1000 distinct per group: the RAW estimator is only unbiased for
    // n >> m (below ~2.5m the linear-counting correction is needed —
    // which is why v_zero rides along in the driver row)
    val rows = (0 until 3000).map(i => (s"src${i % 3}", s"key-$i"))
    val df = rows.toDF("src", "k")
    val old = df.filter(col("k").substr(5, 9).cast("int") % 5 =!= 0)
    val delta = df.filter(col("k").substr(5, 9).cast("int") % 5 === 0)
    val direct = HyperLogLog.registersPer(df, "k", Seq("src"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2)).toSeq
    val merged = HyperLogLog.mergeRegisters(Seq("src"),
      HyperLogLog.registersPer(old, "k", Seq("src")),
      HyperLogLog.registersPer(delta, "k", Seq("src")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2)).toSeq
    assert(merged === direct)
    val est = HyperLogLog.estimatePer(
      HyperLogLog.registersPer(df, "k", Seq("src")), Seq("src"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    // 1000 distinct per src; 3-sigma at m=256 is ~20%
    est.values.foreach(e => assert(e > 800 && e < 1200, est))
    assert(est.keySet === Set("src0", "src1", "src2"))
  }
}
