package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkFunSuite {

  test("salted inner join returns exactly the rows of the plain join") {
    import spark.implicits._
    // one pathologically hot key ("hot") plus normal keys
    val left = (Seq.fill(500)("hot") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = Seq(("hot", 1), ("a", 2), ("z", 3)).toDF("k", "rv")

    val plain = left.join(right, left("k") === right("k"))
      .select(left("k"), col("lv"), col("rv"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
      .select(left("k"), col("lv"), col("rv"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 501) // 500 hot matches + the "a" match
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
