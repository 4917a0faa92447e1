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
}
