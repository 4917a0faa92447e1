package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class VectorCompressionSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("quantize: levels within [0, 255]; min/max map to 0/255") {
    val rows = VectorCompression.quantizeToRows(emb, "vec_id", "embedding")
    val stats = rows.agg(min("qval"), max("qval")).head
    assert(stats.getLong(0) >= 0L)
    assert(stats.getLong(1) <= 255L)
    // each vector's extremes hit the level range ends
    val perVec = rows.groupBy("id").agg(min("qval").as("lo"), max("qval").as("hi"))
      .collect()
    assert(perVec.forall(r => r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == 255L))
  }

  test("dequantization error bounded by (max-min)/510 per component") {
    val rows = VectorCompression.dequantized(emb, "vec_id", "embedding")
      .withColumn("err", abs(col("orig") - col("approx")))
    val ranges = emb.select(col("vec_id").as("id"),
      (array_max(col("embedding")) - array_min(col("embedding"))).cast("double").as("range"))
    val joined = rows.join(ranges, "id")
      .withColumn("bound", col("range") / 510.0 + lit(1e-9))
    assert(joined.filter(col("err") > col("bound")).count() === 0L)
  }

  test("hand-computed quantization of a tiny vector") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0f, 0.5f, 1.0f)), (2L, Array(3.0f, 3.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorCompression.quantizeToRows(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 0L, 0L), (1L, 1L, 128L), (1L, 2L, 255L), // 0.5*255+0.5 floors to 128
      (2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 0L)))    // degenerate range → level 0
  }
}
