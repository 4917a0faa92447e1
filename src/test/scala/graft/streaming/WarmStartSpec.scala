package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Warm-start streaming (StatefulProcessorWithInitialState): the
  * backfill→tail handoff loses nothing and double-counts nothing, the
  * seeded state actually drives the result (a deliberately offset
  * seed shows up in the output), and backfill-only / tail-only keys
  * both survive. */
class WarmStartSpec extends SparkFunSuite {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Double)]) = // (event_id, user, value)
    rows.map { case (e, u, v) =>
      (e, new Timestamp(1700000000000L + e * 1000L), u, "click", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("handoff parity: streamed-from-seed totals equal the full batch aggregate") {
    // user 1: both halves; user 2: backfill only; user 3: tail only
    val rows = Seq(
      (0L, 1L, 1.25), (2L, 1L, 2.00), (1L, 1L, 0.75),
      (4L, 2L, 5.00), (6L, 2L, 1.10),
      (3L, 3L, 9.99), (5L, 3L, 0.01))
    val got = EventPipeline.streamedWarmStartParity(spark, ev(rows))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = ev(rows)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(want.map(_._1) === Seq(1L, 2L, 3L)) // all three key classes
  }

  test("the seeded state drives the result: an offset seed is visible") {
    val spark0 = spark
    import spark0.implicits._
    val tail = ev(Seq((1L, 1L, 1.00), (3L, 1L, 2.00))) // 2 streamed rows
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_warmspec_src").toString
    tail.write.mode("overwrite").parquet(srcDir)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_warmspec_ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // seed user 1 with a FABRICATED history (7 events, 7000 cents):
      // if the processor recomputed instead of reading the seed, the
      // final count would be 2, not 9
      val initial = Seq((1L, 7L, 7000L))
        .toDF("user_id", "n_events", "total_cents")
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .parquet(srcDir)
      val name = s"graft_warmspec_${System.nanoTime()}"
      val q = EventPipeline.userTotalsWarmStart(stream, initial)
        .toDF()
        .writeStream
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val fin = spark.table(name)
        .orderBy(col("n_events").desc).collect().head
      assert(fin.getLong(0) === 1L)
      assert(fin.getLong(1) === 9L)      // 7 seeded + 2 streamed
      assert(fin.getLong(2) === 7300L)   // 7000 + 100 + 200
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
