package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class VectorAggregatesSpec extends SparkFunSuite {

  private def df(rows: Seq[(Int, Seq[Float])]) = {
    GraftFunctions.register(spark)
    val schema = StructType(Seq(
      StructField("g", IntegerType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  test("hand-computed group centroid") {
    val got = df(Seq((1, Seq(1f, 2f)), (1, Seq(3f, 4f)), (2, Seq(10f, 20f))))
      .groupBy("g").agg(GraftFunctions.vectorAvg(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(1) === Seq(2.0, 3.0))
    assert(got(2) === Seq(10.0, 20.0))
  }

  test("partition-order invariance (rounded)") {
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i => (i % 3, Seq.fill(8)(rng.nextFloat())))
    def centroids(partitions: Int) =
      df(rows).repartition(partitions).groupBy("g")
        .agg(transform(GraftFunctions.vectorAvg(col("v")), x => round(x, 6)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(centroids(1) === centroids(13))
  }

  test("dimension mismatch in a group nulls that group only") {
    val got = df(Seq((1, Seq(1f, 2f)), (1, Seq(1f, 2f, 3f)), (2, Seq(5f))))
      .groupBy("g").agg(GraftFunctions.vectorAvg(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1) == null)
    assert(got(2) === Seq(5.0))
  }

  test("binary wire-format input aggregates identically") {
    val base = df(Seq((1, Seq(1f, 3f)), (1, Seq(3f, 5f))))
    val viaArray = base.groupBy("g")
      .agg(GraftFunctions.vectorAvg(col("v"))).head.getSeq[Double](1)
    val viaBinary = base
      .select(col("g"), GraftFunctions.toBinaryVector(col("v")).as("b"))
      .groupBy("g").agg(GraftFunctions.vectorAvg(col("b"))).head.getSeq[Double](1)
    assert(viaArray === Seq(2.0, 4.0))
    assert(viaBinary === viaArray)
  }

  test("SQL surface") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_avg(v) FROM VALUES (array(2.0F, 4.0F)), (array(4.0F, 8.0F)) AS t(v)")
      .head.getSeq[Double](0)
    assert(r === Seq(3.0, 6.0))
  }
}
