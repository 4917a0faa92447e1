package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TopKAggregateSpec extends SparkFunSuite {
  import spark.implicits._

  test("buffer keeps k best under (score DESC, id ASC) with shifting inserts") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 20L), (3.0, 30L), (5.0, 5L), (0.5, 1L)).foreach {
      case (s, i) => buf.insert(s, i)
    }
    // 5.0 ties break toward the smaller id; 0.5 and 1.0 fall off.
    assert(buf.n === 3)
    assert((0 until buf.n).map(i => (buf.scores(i), buf.ids(i))) ===
      Seq((5.0, 5L), (5.0, 20L), (3.0, 30L)))
  }

  test("merge of disjoint buffers equals inserting everything into one") {
    val a = new TopKBuffer(4)
    val b = new TopKBuffer(4)
    Seq((2.0, 1L), (4.0, 2L)).foreach { case (s, i) => a.insert(s, i) }
    Seq((3.0, 3L), (5.0, 4L), (1.0, 5L)).foreach { case (s, i) => b.insert(s, i) }
    val merged = TopKByScore(org.apache.spark.sql.catalyst.expressions.Literal(1.0), org.apache.spark.sql.catalyst.expressions.Literal(1L), 4).merge(a, b)
    assert((0 until merged.n).map(i => (merged.scores(i), merged.ids(i))) ===
      Seq((5.0, 4L), (4.0, 2L), (3.0, 3L), (2.0, 1L)))
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = TopKByScore(org.apache.spark.sql.catalyst.expressions.Literal(1.0), org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = new TopKBuffer(8)
    Seq((2.5, 7L), (9.0, 3L), (2.5, 2L)).foreach { case (s, i) => buf.insert(s, i) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.k === 8 && back.n === 3)
    assert((0 until 3).map(i => (back.scores(i), back.ids(i))) ===
      Seq((9.0, 3L), (2.5, 2L), (2.5, 7L)))
  }

  test("property: aggregate equals the window row_number formulation on any data/partitioning") {
    GraftFunctions.register(spark)
    val rowGen = for {
      g <- Gen.chooseNum(0, 4)
      score <- Gen.chooseNum(0, 20).map(_ / 2.0) // coarse values force ties
      id <- Gen.chooseNum(0L, 1000L)
    } yield (g, score, id)
    val p = Prop.forAll(Gen.listOfN(120, rowGen), Gen.chooseNum(1, 9)) {
      (rows: List[(Int, Double, Long)], parts: Int) =>
        // distinct ids per group so the tie-break is total, as in real data
        val data = rows.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
        val df = data.toDF("g", "score", "id").repartition(parts)
        val viaAgg = df.groupBy("g")
          .agg(GraftFunctions.topKByScore(col("score"), col("id"), 3).as("top"))
          .select(col("g"), posexplode(col("top")))
          .select(col("g"), (col("pos") + 1).as("rnk"), col("col.score"), col("col.id"))
          .as[(Int, Int, Double, Long)].collect().sorted
        val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
        val viaWindow = df.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("g"), col("rnk"), col("score"), col("id"))
          .as[(Int, Int, Double, Long)].collect().sorted
        viaAgg.sameElements(viaWindow)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, s"topk_by_score: ${res.status}")
  }

  test("plans as partial -> final ObjectHashAggregate (map-side partial top-k)") {
    GraftFunctions.register(spark)
    val df = Seq((1, 1.0, 1L)).toDF("g", "score", "id")
      .groupBy("g")
      .agg(GraftFunctions.topKByScore(col("score"), col("id"), 3).as("top"))
    // AQE wraps the plan, so assert on the rendered tree: a partial
    // aggregate below the exchange and a final one above it.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_score") &&
      plan.sliding("ObjectHashAggregate".length).count(_ == "ObjectHashAggregate") == 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("nulls in score or id are skipped, not ranked") {
    GraftFunctions.register(spark)
    val df = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(9.0), None), ("a", None, Some(1L)),
      ("a", Some(5.0), Some(2L)), ("a", Some(7.0), Some(3L)))
      .toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(GraftFunctions.topKByScore(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top")))
      .select(col("col.score"), col("col.id"))
      .as[(Double, Long)].collect().toSeq
    assert(out === Seq((7.0, 3L), (5.0, 2L)))
  }
}
