package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkFunSuite {

  import org.apache.spark.sql.DataFrame

  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    // one pathologically hot key ("hot") plus normal keys
    val left = (Seq.fill(500)("hot") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = Seq(("hot", 1), ("a", 2), ("z", 3)).toDF("k", "rv")
    (left, right)
  }

  private def plainJoin(left: DataFrame, right: DataFrame) =
    left.join(right, left("k") === right("k"))
      .select(left("k"), col("lv"), col("rv"))
      .collect().map(_.toSeq).toSet

  test("salted inner join (hot path exercised) equals the plain join") {
    val (left, right) = fixtures
    val plain = plainJoin(left, right)
    // hotKeyMinCount = 100 ⇒ "hot" (500 rows) is salted, a/b/c join cold
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8,
      hotKeyMinCount = 100L)
      .toDF("k", "lv", "k2", "rv").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 501) // 500 hot matches + the "a" match
  }

  test("no hot keys detected ⇒ pure cold path, still the plain join") {
    val (left, right) = fixtures
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
      .toDF("k", "lv", "k2", "rv") // default minCount 1000 > 500
      .select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted === plainJoin(left, right))
  }

  test("hotKeys detects exactly the viral key — replication is bounded") {
    val (left, _) = fixtures
    val hot = SkewJoin.hotKeys(left, "k", minCount = 100L)
      .collect().map(_.getString(0)).toSet
    // only "hot" is replicated buckets×; a/b/c (and the whole right side
    // minus its one hot row) are never replicated
    assert(hot === Set("hot"))
  }

  test("explicit hot-key relation skips detection and matches the plain join") {
    import spark.implicits._
    val (left, right) = fixtures
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 4,
      hot = Seq("hot").toDF("k"))
      .toDF("k", "lv", "k2", "rv").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted === plainJoin(left, right))
  }

  test("salt actually spreads a hot key across buckets") {
    import spark.implicits._
    val left = Seq.fill(1000)("hot").zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "lv")
    val buckets = left.withColumn("s",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(8)))
      .groupBy("s").count().collect()
    assert(buckets.length > 4, s"hot key landed in only ${buckets.length} buckets")
  }

  test("buckets validation") {
    import spark.implicits._
    val d = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(d, d, "k", 0)
    }
  }
}
