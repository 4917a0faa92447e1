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
}
