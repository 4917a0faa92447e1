package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental stats: merged batch states equal the full rescan
  * exactly (the merge-closure contract), in any association order. */
class IncrementalStatsSpec extends SparkFunSuite {
  import spark.implicits._

  private def batch(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"g${i % 3}", (i * 37 % 211 - 50).toLong))
      .toDF("id", "grp", "v")

  private val b1 = batch(0 until 100)
  private val b2 = batch(100 until 160)
  private val b3 = batch(160 until 161) // single-row delta
  private lazy val full = b1.unionByName(b2).unionByName(b3)

  private def st(df: DataFrame) = IncrementalStats.summarize(df, Seq("grp"), "v")

  test("merge of per-batch states equals the full rescan") {
    val merged = IncrementalStats.merge(Seq(st(b1), st(b2), st(b3)), Seq("grp"))
    assert(IncrementalStats.rescanEquals(full, merged, Seq("grp"), "v"))
  }

  test("merge is associative: (s1 ⊕ s2) ⊕ s3 == s1 ⊕ (s2 ⊕ s3)") {
    val left = IncrementalStats.merge(Seq(
      IncrementalStats.merge(Seq(st(b1), st(b2)), Seq("grp")), st(b3)), Seq("grp"))
    val right = IncrementalStats.merge(Seq(
      st(b1), IncrementalStats.merge(Seq(st(b2), st(b3)), Seq("grp"))), Seq("grp"))
    assert(left.orderBy("grp").collect().toSeq ===
      right.orderBy("grp").collect().toSeq)
  }

  test("a group present only in the delta appears after the merge") {
    val delta = Seq((999L, "gNEW", 5L)).toDF("id", "grp", "v")
    val merged = IncrementalStats.merge(Seq(st(b1), st(delta)), Seq("grp"))
    val row = merged.filter($"grp" === "gNEW").collect()
    assert(row.length === 1 && row(0).getAs[Long]("cnt") === 1L &&
      row(0).getAs[Long]("sum_v") === 5L)
  }

  test("card mean is sum/cnt to the requested scale") {
    val merged = IncrementalStats.merge(Seq(st(b1), st(b2), st(b3)), Seq("grp"))
    val card = IncrementalStats.card(merged, 6)
    card.collect().foreach { r =>
      val expect = BigDecimal(r.getAs[Long]("sum_v").toDouble / r.getAs[Long]("cnt"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("mean_v") - expect) < 1e-12)
    }
  }

  test("streaming parity: complete-mode summarize equals the batch rescan after every batch") {
    // merge-closure is exactly what structured streaming state
    // maintenance needs — summarize() runs unchanged as a streaming
    // aggregation and matches the batch answer batch by batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = st(input.toDF().toDF("id", "grp", "v"))
      .writeStream.format("memory").queryName("inc_stats")
      .outputMode("complete").start()
    try {
      val batches = Seq(0 until 50, 50 until 120, 120 until 121)
      var seen: Range = 0 until 0
      batches.foreach { r =>
        input.addData(r.map(i => (i.toLong, s"g${i % 3}", (i * 37 % 211 - 50).toLong)))
        q.processAllAvailable()
        seen = 0 until r.end
        val got = spark.table("inc_stats").orderBy("grp").collect().toSeq
        val want = st(batch(seen)).orderBy("grp").collect().toSeq
        assert(got === want, s"after ${r.end} rows")
      }
    } finally q.stop()
  }

  test("sumsq is exact decimal (negative values square positive)") {
    val merged = IncrementalStats.merge(Seq(st(b1), st(b2), st(b3)), Seq("grp"))
    val viaSql = full.groupBy("grp")
      .agg(sum(($"v" * $"v").cast("decimal(38,0)")).cast("decimal(38,0)").as("want"))
    val joined = merged.join(viaSql, "grp").collect()
    joined.foreach { r =>
      assert(r.getAs[java.math.BigDecimal]("sumsq_v") ===
        r.getAs[java.math.BigDecimal]("want"))
    }
  }
}
