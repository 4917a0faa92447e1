package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/**
 * Misra–Gries sketch + two-pass exact heavy hitters. Pins the
 * load-bearing guarantee (every item above the frequency bound is in
 * the summary, across partition merges), the undercount bound, and
 * the end-to-end exactness of [[graft.operators.HeavyHitters]].
 */
class FrequentItemsSpec extends SparkFunSuite {

  import spark.implicits._

  GraftFunctions.register(spark)

  /** Zipfian-ish synthetic: token w<i> appears ~1000/i times. */
  private def zipf(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(math.max(1000 / i, 1))(s"w$i"))

  test("superset guarantee survives partition merges; counts undercount by <= N/(cap+1)") {
    val items = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(zipf(500))
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = items.size.toLong
    val cap = 64
    for (parts <- Seq(1, 7)) {
      val df = items.grouped(40).map(g => Tuple1(g)).toSeq.toDF("toks")
        .repartition(parts)
      val sk = df.agg(GraftFunctions.frequentItemsSketch(col("toks"), cap))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= cap)
      val bound = total / (cap + 1)
      // every item above the bound is present...
      exact.filter(_._2 > bound).keys.foreach(k =>
        assert(sk.contains(k), s"missing $k at parts=$parts"))
      // ...and sketch counts are lower bounds within the bound
      sk.foreach { case (k, c) =>
        assert(c <= exact(k), s"$k overcounts")
        assert(c >= exact(k) - bound, s"$k undercounts past the bound")
      }
    }
  }

  test("sketch output is deterministically ordered (cnt DESC, item ASC)") {
    val df = Seq(Tuple1(Seq("b", "a", "a", "c", "c"))).toDF("toks")
    val got = df.agg(GraftFunctions.frequentItemsSketch(col("toks"), 10))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("a", 2L), ("c", 2L), ("b", 1L)))
  }

  test("heavyTokens is exact: equals the full groupBy on sf0.001 documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val got = graft.operators.HeavyHitters
      .heavyTokens(docs, "text", num = 1, den = 200)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("t"))
    val n = toks.count()
    val want = toks.groupBy("t").count()
      .filter(col("count") * 200 >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty)
    assert(got === want)
  }
}
