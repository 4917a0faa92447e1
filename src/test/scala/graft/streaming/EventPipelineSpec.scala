package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class EventPipelineSpec extends SparkFunSuite {

  private def t(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  private def toyEvents = Seq(
    Ev(1, t(0, 10), 100, "view", 1.5, """{"k": 1}"""),
    Ev(2, t(0, 20), 100, "view", 2.5, """{"k": 1}"""),
    Ev(3, t(0, 30), 101, "click", 10.0, """{"k": 2}"""),
    Ev(4, t(1, 5), 100, "view", 4.0, """{"k": 2}"""))

  test("windowedTypeStats (batch): hand-computed windows, exact sums") {
    import spark.implicits._
    val got = EventPipeline.windowedTypeStats(toyEvents.toDF(), "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(got.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq === Seq(
      (t(0), "click", 1L, 10.0),
      (t(0), "view", 2L, 4.0),
      (t(1), "view", 1L, 4.0)))
  }

  test("propsRollup (batch): json extraction + per-key totals") {
    import spark.implicits._
    val got = EventPipeline.propsRollup(toyEvents.toDF()).orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === Seq(
      (1L, 2L, 4.0), (2L, 2L, 14.0)))
  }

  test("resampleHourly: gaps fill with zero rows; cents are exact; span guard drops") {
    import spark.implicits._
    // user 100 spans hours 0..3 with nothing in hours 1..2; user 101 one hour
    val ev = Seq(
      Ev(1, t(0, 10), 100, "view", 1.25, "{}"),
      Ev(2, t(0, 50), 100, "view", 2.50, "{}"),
      Ev(3, t(3, 5), 100, "click", 0.25, "{}"),
      Ev(4, t(2, 0), 101, "view", 9.99, "{}")).toDF()
    val got = EventPipeline.resampleHourly(ev).orderBy("user_id", "hour").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (100L, t(0), 2L, 375L),
      (100L, t(1), 0L, 0L),
      (100L, t(2), 0L, 0L),
      (100L, t(3), 1L, 25L),
      (101L, t(2), 1L, 999L)))
    // a 2-hour guard drops user 100 (3-hour span), keeps user 101
    val guarded = EventPipeline.resampleHourly(ev, maxSpanHours = 2)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(guarded === Set(101L))
  }

  test("funnel: strictly-after ordering; out-of-order events don't convert") {
    import spark.implicits._
    val ev = Seq(
      // user 1 converts fully in order
      Ev(1, t(0), 1L, "signup", 0, "{}"),
      Ev(2, t(1), 1L, "view", 0, "{}"),
      Ev(3, t(2), 1L, "purchase", 0, "{}"),
      // user 2: purchase BEFORE view → reaches step 2 only
      Ev(4, t(0), 2L, "signup", 0, "{}"),
      Ev(5, t(3), 2L, "view", 0, "{}"),
      Ev(6, t(1), 2L, "purchase", 0, "{}"),
      // user 3: no signup → reaches nothing
      Ev(7, t(0), 3L, "view", 0, "{}"),
      Ev(8, t(1), 3L, "purchase", 0, "{}"),
      // user 4: simultaneous signup+view → strict > rejects the view
      Ev(9, t(4), 4L, "signup", 0, "{}"),
      Ev(10, t(4), 4L, "view", 0, "{}")).toDF()
    val got = EventPipeline.funnel(ev, Seq("signup", "view", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("typeValueMad: hand-computed median and MAD, outlier-resistant") {
    import spark.implicits._
    // values 1,2,3,4,100: median 3, |x-3| = 2,1,0,1,97 → MAD 1
    val ev = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
      Ev(i.toLong, t(0, i), 1L, "x", v, "{}")
    }
    val got = EventPipeline.typeValueMad(ev.toDF()).collect().head
    assert(got.getDouble(1) === 3.0)
    assert(got.getDouble(2) === 1.0)
    // even count interpolates: 1,2,3,10 → median 2.5, devs 1.5,0.5,0.5,7.5 → MAD 1.0
    val ev2 = Seq(1.0, 2.0, 3.0, 10.0).zipWithIndex.map { case (v, i) =>
      Ev(i.toLong, t(1, i), 1L, "y", v, "{}")
    }
    val got2 = EventPipeline.typeValueMad(ev2.toDF()).collect().head
    assert(got2.getDouble(1) === 2.5)
    assert(got2.getDouble(2) === 1.0)
  }

  test("rolling7dActivity: value-based frame skips absent days correctly") {
    import spark.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // user 1: events on days 1, 2, 9 — day 9's window must NOT see days 1-2
    val ev = Seq(
      Ev(1, day(1), 1L, "x", 0, "{}"), Ev(2, day(1), 1L, "x", 0, "{}"),
      Ev(3, day(2), 1L, "x", 0, "{}"),
      Ev(4, day(9), 1L, "x", 0, "{}")).toDF()
    val got = EventPipeline.rolling7dActivity(ev).orderBy("day").collect()
      .map(r => (r.getTimestamp(1).toString.take(10), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L),
      ("2024-01-02", 1L, 3L), // day 1 within 6 days
      ("2024-01-09", 1L, 1L))) // days 1-2 aged out (> 6 days back)
  }

  test("winsorize card and MAD outliers: hand-computed fences and flags") {
    import spark.implicits._
    // 100 values 1..99 plus one 1000: p01/p99 interpolated fences,
    // the 1000 is both clamped and a 3.5-MAD outlier
    val ev = ((1 to 99).map(_.toDouble) :+ 1000.0).zipWithIndex.map {
      case (v, i) => Ev(i.toLong, t(0, i % 60), 1L, "x", v, "{}")
    }
    val w = EventPipeline.typeValueWinsorize(ev.toDF()).collect().head
    assert(w.getAs[Long]("n") === 100L)
    assert(w.getAs[Long]("n_below") === 1L) // value 1 sits below p01
    assert(w.getAs[Long]("n_above") === 1L) // the 1000
    val o = EventPipeline.typeValueOutliers(ev.toDF(), 3.5).collect()
    assert(o.map(_.getAs[Long]("event_id")).toSeq === Seq(99L))
  }

  test("streaming windowed agg: append emits a window once the watermark passes it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventPipeline.windowedTypeStatsStream(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode("append").start()
    try {
      input.addData(toyEvents.take(3)) // all in hour 0
      q.processAllAvailable()
      // watermark has not passed hour-0 end yet → nothing appended
      assert(spark.table("ev_agg").isEmpty)
      input.addData(Ev(99, t(2, 30), 1, "view", 0.0, "{}")) // advances watermark past hour 1
      q.processAllAvailable()
      val rows = spark.table("ev_agg").orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq === Seq(
        (t(0), "click", 1L, 10.0),
        (t(0), "view", 2L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark: duplicate event ids emitted once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventPipeline.dedupEvents(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("ev_dedup")
      .outputMode("append").start()
    try {
      input.addData(toyEvents.take(2))
      q.processAllAvailable()
      input.addData(toyEvents.take(2)) // exact duplicates, within watermark
      q.processAllAvailable()
      assert(spark.table("ev_dedup").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("topk_by_score works under streaming aggregation (update mode, merges across batches)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[Ev]
    val q = input.toDF()
      .groupBy("event_type")
      .agg(graft.functions.GraftFunctions.topKByScore(col("value"), col("event_id"), 2).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), col("pos"), col("col.id").as("event_id"))
      .writeStream.format("memory").queryName("ev_topk")
      .outputMode("complete").start()
    try {
      input.addData(toyEvents.take(3))
      q.processAllAvailable()
      input.addData(Ev(9, t(3), 7, "view", 3.0, "{}")) // displaces view event 2 (1.5)
      q.processAllAvailable()
      val got = spark.table("ev_topk")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      // click: only event 3; view: top-2 of values (1.5, 2.5, 3.0) → events 9, 2
      assert(got === Seq(("click", 0, 3L), ("view", 0, 9L), ("view", 1, 2L)))
    } finally q.stop()
  }

  test("custom keyed state: running per-user totals across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventPipeline.userRunningTotals(input.toDF())
      .writeStream.format("memory").queryName("ev_state")
      .outputMode("update").start()
    try {
      input.addData(toyEvents.take(3))
      q.processAllAvailable()
      input.addData(toyEvents.drop(3)) // one more event for user 100
      q.processAllAvailable()
      val last = spark.table("ev_state")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((100L, 3L, 8.0), (101L, 1L, 10.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState ageing: idle keys removed under event-time timeout; " +
      "NoTimeout keeps them forever (the contrast that makes the timeout load-bearing)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // --- aged variant: user 100 accumulates, goes idle past the
    //     watermark → final total flushes and state is REMOVED, so a
    //     returning user 100 starts a FRESH count.
    val aged = MemoryStream[Ev]
    val q1 = EventPipeline.userRunningTotalsAged(aged.toDF(),
        watermark = "10 minutes", idleSeconds = 1800)
      .writeStream.format("memory").queryName("ev_aged")
      .outputMode("update").start()
    try {
      aged.addData(toyEvents.take(2)) // user 100 at 0:10/0:20, total 4.0
      q1.processAllAvailable()
      // 2:30 event advances the watermark to 2:20; user 100 idle since
      // 0:50 (< 2:20) → timed out, state removed
      aged.addData(Ev(99, t(2, 30), 200, "view", 0.0, "{}"))
      q1.processAllAvailable()
      aged.addData(Ev(5, t(3, 0), 100, "view", 7.0, "{}")) // user 100 returns
      q1.processAllAvailable()
      val perBatchMax = spark.table("ev_aged")
        .filter(col("user_id") === 100L)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      // history: (2, 4.0) running, (2, 4.0) flush, then the FRESH (1, 7.0)
      assert(perBatchMax === Set((2L, 4.0), (1L, 7.0)))
    } finally q1.stop()

    // --- the failing-without-timeout contrast: identical fixture
    //     through the NoTimeout operator — abandoned state survives and
    //     the returning event CONTINUES the old count.
    val kept = MemoryStream[Ev]
    val q2 = EventPipeline.userRunningTotals(kept.toDF())
      .writeStream.format("memory").queryName("ev_kept")
      .outputMode("update").start()
    try {
      kept.addData(toyEvents.take(2))
      q2.processAllAvailable()
      kept.addData(Ev(99, t(2, 30), 200, "view", 0.0, "{}"))
      q2.processAllAvailable()
      kept.addData(Ev(5, t(3, 0), 100, "view", 7.0, "{}"))
      q2.processAllAvailable()
      val last = spark.table("ev_kept")
        .filter(col("user_id") === 100L)
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((3L, 11.0))) // state never aged: 2 + 1 events
    } finally q2.stop()
  }

  test("batch and streaming window aggregation agree on the events table") {
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val batch = EventPipeline.windowedTypeStats(events, "1 hour")
    // sanity: deterministic exact sums — run twice, identical results
    val a = batch.orderBy("window_start", "event_type").collect()
    val b = batch.orderBy("window_start", "event_type").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.nonEmpty)
  }

  test("typeValueQuantiles: exact interpolation; approx_percentile close") {
    import spark.implicits._
    // 5 values for one type: quantile_cont semantics at rank (n-1)q
    val ev = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
      Ev(i.toLong, t(0, i), 1L, "view", v, "{}")
    }.toDF()
    val got = EventPipeline.typeValueQuantiles(ev, Seq(0.5, 0.75))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(0.5) === 3.0)
    assert(got(0.75) === 4.0) // (5-1)*0.75 = rank 3 exactly
    // the 100 TB path: t-digest sketch within tolerance of exact
    val approx = ev.agg(
      org.apache.spark.sql.functions.percentile_approx(
        col("value"), lit(0.5), lit(10000))).head.getDouble(0)
    assert(math.abs(approx - 3.0) <= 1.0)
  }

  test("typeValueQuantilesApprox: exact vals match, rank guarantee holds on real data") {
    val events = EventPipeline.normalizeTs(
      spark.read.parquet(s"$Sf0001/events.parquet"))
    val qs = Seq(0.5, 0.9, 0.99)
    val approx = EventPipeline.typeValueQuantilesApprox(events, qs)
      .collect().map(r =>
        (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val exact = EventPipeline.typeValueQuantiles(events, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(approx.keySet === exact.keySet)
    // the `val` column IS the exact quantile; the sketch's rank bound holds
    exact.foreach { case (k, v) => assert(approx(k)._1 === v, k) }
    assert(approx.values.forall(_._2), "approx_percentile broke its rank guarantee")
  }

  test("sessionize agrees with Spark's native session_window on session starts") {
    // session_window merges events closer than the gap; our explicit
    // lag+running-sum construction starts a new session when the gap
    // EXCEEDS gapSeconds. Off the exact-boundary case (measure zero on
    // real timestamps) the two define identical sessions.
    val ev = EventPipeline.normalizeTs(
      spark.read.parquet(s"$Sf0001/events.parquet"))
    val native = ev.groupBy(
        col("user_id"), session_window(col("ts"), "600 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val ours = EventPipeline.sessionize(ev, gapSeconds = 600)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(ours === native)
  }

  test("flatMapGroupsWithState + event-time timeout: idle users emit one summary, state removed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventPipeline.userIdleSummaries(input.toDF(),
        watermark = "10 minutes", idleSeconds = 1800)
      .writeStream.format("memory").queryName("ev_idle")
      .outputMode("append").start()
    try {
      input.addData(toyEvents.take(3)) // user 100 at 0:10/0:20, user 101 at 0:30
      q.processAllAvailable()
      assert(spark.table("ev_idle").isEmpty) // nobody idle past the watermark yet
      // an event at 2:30 moves the watermark to 2:20 — both users idle
      // since before 1:50/1:00 → their summaries fire
      input.addData(Ev(99, t(2, 30), 200, "view", 0.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("ev_idle")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set((100L, 2L, 4.0), (101L, 1L, 10.0)))
      // state was removed: a NEW event for user 100 starts a fresh count
      input.addData(Ev(100, t(3, 0), 100, "view", 7.0, "{}"))
      q.processAllAvailable()
      input.addData(Ev(101, t(9, 0), 300, "view", 0.0, "{}")) // advance watermark far
      q.processAllAvailable()
      val second = spark.table("ev_idle")
        .filter(col("user_id") === 100L).collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(second === Set((2L, 4.0), (1L, 7.0))) // fresh state, not 3 events
    } finally q.stop()
  }

  test("readStream -> transform -> writeStream to a parquet file sink") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[Ev]
    val q = EventPipeline.windowedTypeStatsStream(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(toyEvents.take(3))
      q.processAllAvailable()
      input.addData(Ev(99, t(2, 30), 1, "view", 0.0, "{}")) // advance watermark
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
        .orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq === Seq(
        (t(0), "click", 1L, 10.0),
        (t(0), "view", 2L, 4.0)))
    } finally q.stop()
  }

  test("stream-stream join: clicks attribute to same-user views within the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = EventPipeline.clickViewJoin(clicks.toDF(), views.toDF(),
        watermark = "10 minutes", horizonSeconds = 1800)
      .writeStream.format("memory").queryName("ev_ssjoin")
      .outputMode("append").start()
    try {
      views.addData(Ev(1, t(0, 0), 100, "view", 1.0, "{}"),
        Ev(2, t(0, 20), 100, "view", 2.0, "{}"),
        Ev(3, t(0, 0), 200, "view", 3.0, "{}"))
      clicks.addData(Ev(10, t(0, 25), 100, "click", 0.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("ev_ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      // click 10 (user 100, 0:25) matches views 1 (0:00) and 2 (0:20);
      // view 3 belongs to another user
      assert(got === Set((10L, 1L), (10L, 2L)))
    } finally q.stop()
  }

  test("ewmaSmoothed: hand series, dyadic-exact, partitioning-invariant") {
    import spark.implicits._
    val ev = Seq(
      (1L, "1970-01-01 00:00:01", 10L, 4.0),
      (2L, "1970-01-01 00:00:02", 10L, 8.0),
      (3L, "1970-01-01 00:00:03", 10L, 2.0),
      (4L, "1970-01-01 00:00:01", 20L, 6.0)
    ).toDF("event_id", "t", "user_id", "value")
      .select(col("event_id"), col("t").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    val out = EventPipeline.ewmaSmoothed(ev)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("ewma"))).toSeq
    // 4 -> (8+4)/2 = 6 -> (2+6)/2 = 4 ; user 20 seeds at 6
    assert(out === Seq((10L, 1L, 4.0), (10L, 2L, 6.0), (10L, 3L, 4.0),
      (20L, 4L, 6.0)))
    val re = EventPipeline.ewmaSmoothed(ev.repartition(5))
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("ewma"))).toSeq
    assert(re === out)
  }

  test("ewmaSmoothed: duplicate timestamps order by event_id (total order)") {
    import spark.implicits._
    val ev = Seq(
      (2L, "1970-01-01 00:00:01", 1L, 8.0),
      (1L, "1970-01-01 00:00:01", 1L, 4.0)
    ).toDF("event_id", "t", "user_id", "value")
      .select(col("event_id"), col("t").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    val out = EventPipeline.ewmaSmoothed(ev).orderBy("event_id").collect()
    assert(out.map(_.getAs[Double]("ewma")).toSeq === Seq(4.0, 6.0))
  }

  test("streaming session_window: a session appends once the watermark passes its end; in-gap events merge") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventPipeline.normalizeTs(input.toDF())
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "600 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("ev_sessions")
      .outputMode("append").start()
    try {
      // two events 5 min apart -> ONE session (gap 10 min)
      input.addData(Ev(1, t(0), 7, "click", 0.0, "{}"),
        Ev(2, t(0, 5), 7, "view", 0.0, "{}"))
      q.processAllAvailable()
      assert(spark.table("ev_sessions").isEmpty) // watermark not past end
      // an event far in the future closes and emits the session
      input.addData(Ev(3, t(5), 7, "view", 0.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("ev_sessions").collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Long]("user_id") === 7L)
      assert(r.getAs[Long]("n_events") === 2L)
      assert(r.getAs[java.sql.Timestamp]("session_start") === t(0))
      // end = last event + gap = 00:05 + 10 min
      assert(r.getAs[java.sql.Timestamp]("session_end") === t(0, 15))
    } finally q.stop()
  }

  test("typeTransitions: hand bigrams with tie-broken order and per-prev probabilities") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click -> view -> view  (same ts for 2,3: event_id breaks tie)
      (1L, t(0), 1L, "click"), (2L, t(0, 5), 1L, "view"), (3L, t(0, 5), 1L, "view"),
      // user 2: click -> purchase
      (4L, t(1), 2L, "click"), (5L, t(1, 30), 2L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val out = EventPipeline.typeTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out === Seq(
      ("click", "purchase", 1L, 2L, 0.5),
      ("click", "view", 1L, 2L, 0.5),
      ("view", "view", 1L, 1L, 1.0)))
  }

  test("dauWau: trailing-7 windows, stickiness, only observed days emitted") {
    import spark.implicits._
    // user 1 active day 0 and day 3; user 2 active day 3
    val ev = Seq(
      (1L, t(0), 10L), (2L, t(24 * 3), 10L), (3L, t(24 * 3, 30), 20L)
    ).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val out = EventPipeline.dauWau(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // day0: dau 1, wau 1; day3: dau 2, wau (u1 from day0+day3, u2) = 2
    assert(out === Seq(
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-04", 2L, 2L, 1.0)))
  }

  test("streamedWindowedTypeStats: real micro-batch run == closed batch windows") {
    import org.apache.spark.sql.functions._
    // the driver row's contract, asserted against the BATCH plan: the
    // file-source -> watermarked agg -> file-sink execution emits
    // exactly the windows with end <= max(ts) - delay
    val streamed = EventPipeline.streamedWindowedTypeStats(
        spark, s"$Sf0001/events.parquet", "1 hour", "30 minutes")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val ev = EventPipeline.normalizeTs(
      spark.read.parquet(s"$Sf0001/events.parquet"))
    val wm = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime -
      30L * 60 * 1000
    val batch = EventPipeline.windowedTypeStats(ev, "1 hour")
      .filter((unix_millis(col("window_start")) + 3600L * 1000) <= wm)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("seasonalOutliers: baseline is per hour-of-week, gate is global MAD") {
    import spark.implicits._
    // three weeks of a daily 09:00 slot at 10 events, one broken day
    // at 2 — three samples per weekday class, so the class median
    // (10) resists its own broken member
    val days = (0 until 21)
    val ev = days.flatMap { d =>
      val n = if (d == 6) 2 else 10
      (0 until n).map(i => (d.toLong * 100 + i,
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:${i}%02d:00")))
    }.toDF("event_id", "ts")
    val out = EventPipeline.seasonalOutliers(ev, k = 3)
      .orderBy("hour_ts").collect()
    assert(out.length === 21)
    val flagged = out.filter(_.getBoolean(4))
    assert(flagged.length === 1)
    assert(flagged.head.getLong(1) === 2L)
    // the broken day's baseline comes from its own weekday class
    assert(flagged.head.getDouble(2) === 10.0)
  }

  test("returnHazard: life table from inter-activity gaps, exact") {
    import spark.implicits._
    // u1 active days 1,2,4 → gaps {1,2}; u2 active 1,3,6 → gaps {2,3}
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-04"),
      (2L, "2024-01-01"), (2L, "2024-01-03"), (2L, "2024-01-06"))
      .zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(s"$d 12:00:00"))
      }.toDF("event_id", "user_id", "ts")
    val out = EventPipeline.returnHazard(ev, maxDays = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // gaps {1,2,2,3}: at-risk suffix sums 4,3,1
    assert(out.toSeq === Seq(
      (1L, 1L, 4L, 250000L), (2L, 2L, 3L, 666666L),
      (3L, 1L, 1L, 1000000L)))
  }

  test("whaleConcentration: top-k share with user-id tie-break") {
    import spark.implicits._
    val ev = (Seq.fill(6)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u, "click") }
      .toDF("event_id", "user_id", "event_type")
    val r = EventPipeline.whaleConcentration(ev, k = 2)
      .collect().head
    // top-2 users (10→6, 20→3) own 9 of 10 events
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((3L, 10L, 9L, 900000L)))
  }

  test("cusumHourly: closed form equals the sequential recurrence") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hourly counts 5,5,9,9,2 with k=6 → S = 0,0,3,6,2 (by hand);
    // events get distinct minutes inside each hour
    val ev = Seq(
      ("2024-01-01 00:00:00", 5), ("2024-01-01 01:00:00", 5),
      ("2024-01-01 02:00:00", 9), ("2024-01-01 03:00:00", 9),
      ("2024-01-01 04:00:00", 2)).flatMap { case (h, n) =>
      (0 until n).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(h).getTime + i * 60000L))
    }.map { case (id, ms) => (id, new java.sql.Timestamp(ms)) }
      .toDF("event_id", "ts")
    val out = EventPipeline.cusumHourly(ev, driftK = 6L, alarmH = 5L)
      .orderBy("hour_ts")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (5L, 0L, false), (5L, 0L, false), (9L, 3L, false),
      (9L, 6L, true), (2L, 2L, false)))
  }

  test("streamedClickViewParity: file-to-file stream-stream join == batch join") {
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val streamed = EventPipeline.streamedClickViewParity(
        spark, events, "10 minutes", horizonSeconds = 600)
      .orderBy("click_id", "view_id")
      .collect().map(_.toSeq).toSeq
    val batch = EventPipeline.clickViewJoin(
        events.filter(col("event_type") === "click"),
        events.filter(col("event_type") === "view"),
        "10 minutes", horizonSeconds = 600)
      .orderBy("click_id", "view_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streamedClickViewOuterParity: null rows gated by the final watermark") {
    import spark.implicits._
    // wm = min(max click 2:40, max view 2:00) − 10 min = 1:50.
    // C1 matches V1; C3 matches V2; C2 (0:50, unmatched, < wm) emits
    // the null row; C4 (1:55, unmatched, ≥ wm) is held in state and
    // must NOT emit.
    val evs = Seq(
      Ev(1, t(0, 30), 100, "view", 1.0, "{}"),   // V1
      Ev(2, t(0, 35), 100, "click", 0.0, "{}"),  // C1 -> V1
      Ev(3, t(0, 50), 200, "click", 0.0, "{}"),  // C2 unmatched, old
      Ev(4, t(2, 0), 300, "view", 2.0, "{}"),    // V2 (max view ts)
      Ev(5, t(2, 5), 300, "click", 0.0, "{}"),   // C3 -> V2
      Ev(6, t(1, 55), 400, "click", 0.0, "{}"),  // C4 unmatched, in horizon
      Ev(7, t(2, 40), 500, "click", 0.0, "{}"))  // C5 unmatched, above wm
    val out = EventPipeline.streamedClickViewOuterParity(
        spark, evs.toDF(), "10 minutes", horizonSeconds = 600)
      .orderBy("click_id").collect()
    val pairs = out.map(r => (r.getLong(0),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(pairs === Seq((2L, 1L), (3L, -1L), (5L, 4L)))
  }

  test("streamedUpsertParity: latest row per key survives multi-batch merges") {
    import spark.implicits._
    val evs = Seq(
      Ev(1, t(0, 10), 100, "view", 1.0, "{}"),
      Ev(2, t(0, 30), 100, "view", 2.0, "{}"),   // latest for 100
      Ev(3, t(0, 20), 200, "click", 3.0, "{}"),
      Ev(4, t(0, 20), 200, "click", 4.0, "{}"),  // ts tie → max event_id
      Ev(5, t(1, 0), 300, "view", 5.0, "{}"))
    val out = EventPipeline.streamedUpsertParity(spark, evs.toDF())
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (100L, 2L, 2.0), (200L, 4L, 4.0), (300L, 5L, 5.0)))
  }

  test("streamedUpsertParity: empty source yields the empty typed frame") {
    import spark.implicits._
    val out = EventPipeline.streamedUpsertParity(
      spark, Seq.empty[Ev].toDF())
    assert(out.columns.toSeq ===
      Seq("user_id", "last_event_id", "last_ts", "last_value"))
    assert(out.count() === 0L)
  }

  test("streamedTypeHistParity: MapState counts + ListState top-3 equal the batch replay") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val streamed = EventPipeline.streamedTypeHistParity(spark, ev)
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    val cents = ev.select(col("user_id").cast("long").as("user_id"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val h = cents.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_type"))
    val t = cents
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("cents").desc)))
      .filter(col("rn") <= 3)
      .groupBy("user_id").agg(sum("cents").as("top3_cents"))
    val batch = h.join(t, "user_id")
      .select("user_id", "event_type", "n_type", "top3_cents")
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamedTypeHistParity: a user with fewer than three events sums what exists") {
    import spark.implicits._
    val evs = Seq(
      Ev(1, t(0, 10), 100, "view", 1.25, "{}"),
      Ev(2, t(0, 30), 100, "view", 2.0, "{}"),
      Ev(3, t(0, 20), 200, "click", 3.0, "{}"))
    val out = EventPipeline.streamedTypeHistParity(spark, evs.toDF())
      .orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (100L, "view", 2L, 325L), (200L, "click", 1L, 300L)))
  }

  test("streamedTypeHistParity: negative cents across batches — final top-3, not max emission") {
    import spark.implicits._
    // +500 then −200 for one user with an under-filled top-3 buffer:
    // if the batches split, the +500-only emission (500) EXCEEDS the
    // true final top-3 sum (300) — the r15 review case where a
    // max-over-emissions gate silently assumed nonnegative metrics.
    // The n_user_events high-water pick must return 300 under every
    // file-to-batch split.
    val evs = Seq(
      Ev(1, t(0, 10), 100, "view", 5.0, "{}"),
      Ev(2, t(0, 30), 100, "click", -2.0, "{}"))
    val out = EventPipeline.streamedTypeHistParity(spark, evs.toDF())
      .orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (100L, "click", 1L, 300L), (100L, "view", 1L, 300L)))
  }

  test("streamedTypeTotalsComplete: final complete table equals batch group-by") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val streamed = EventPipeline.streamedTypeTotalsComplete(spark, ev)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val batch = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamedWindowedUpdateParity: max over update emissions equals batch counts") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val streamed = EventPipeline.streamedWindowedUpdateParity(spark, ev)
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventPipeline.normalizeTs(ev)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("attribution: first/last touch per converting user, direct bucket, ties by id") {
    import spark.implicits._
    val evs = Seq(
      // u1: view → click → purchase: first=view, last=click
      Ev(1, t(0, 1), 1, "view", 0, "{}"), Ev(2, t(0, 2), 1, "click", 0, "{}"),
      Ev(3, t(0, 3), 1, "purchase", 0, "{}"),
      // u2: purchase first, later view: first=purchase, last=(none)
      Ev(4, t(1, 1), 2, "purchase", 0, "{}"), Ev(5, t(1, 2), 2, "view", 0, "{}"),
      // u3: never converts — excluded entirely
      Ev(6, t(2, 1), 3, "click", 0, "{}"),
      // u4: same-ts tie — event_id 7 (view) precedes 8 (purchase)
      Ev(7, t(3, 1), 4, "view", 0, "{}"), Ev(8, t(3, 1), 4, "purchase", 0, "{}"))
    val got = EventPipeline.attribution(evs.toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("first_touch", "purchase", 1L), ("first_touch", "view", 2L),
      ("last_touch", "(none)", 1L), ("last_touch", "click", 1L),
      ("last_touch", "view", 1L)))
  }

  test("property: attribution matches a direct per-user simulation") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genEvents = for {
      n <- Gen.chooseNum(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 6L)
        h <- Gen.chooseNum(0, 5)
        m <- Gen.chooseNum(0, 59)
        ty <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (u, h, m, ty))
    } yield evs.zipWithIndex.map { case ((u, h, m, ty), i) =>
      Ev(i.toLong, t(h, m), u, ty, 0, "{}")
    }
    val prop = Prop.forAll(genEvents) { evs =>
      def key(e: Ev) = (e.ts.getTime, e.event_id)
      implicit val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
      val byUser = evs.groupBy(_.user_id)
      val want = byUser.toSeq.flatMap { case (_, us) =>
        val conv = us.filter(_.event_type == "purchase")
        if (conv.isEmpty) Seq.empty
        else {
          val fp = conv.minBy(key)
          val first = us.minBy(key).event_type
          val before = us.filter(e =>
            ord.lt(key(e), key(fp)) && e.event_type != "purchase")
          val last =
            if (before.isEmpty) "(none)" else before.maxBy(key).event_type
          Seq(("first_touch", first), ("last_touch", last))
        }
      }.groupBy(p => p).view.mapValues(_.size.toLong).toSeq
        .map { case ((t0, ty), n) => (t0, ty, n) }.sorted
      val got = EventPipeline.attribution(evs.toDF().repartition(3))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("typePaths3: contiguous trigrams per user, support filter") {
    import spark.implicits._
    val evs = Seq(
      Ev(1, t(0, 1), 1, "A", 0, "{}"), Ev(2, t(0, 2), 1, "B", 0, "{}"),
      Ev(3, t(0, 3), 1, "C", 0, "{}"), Ev(4, t(0, 4), 1, "D", 0, "{}"),
      Ev(5, t(0, 1), 2, "A", 0, "{}"), Ev(6, t(0, 2), 2, "B", 0, "{}"),
      Ev(7, t(0, 3), 2, "C", 0, "{}"))
    val all = EventPipeline.typePaths3(evs.toDF()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(all.toSet === Set(("A", "B", "C", 2L), ("B", "C", "D", 1L)))
    val sup2 = EventPipeline.typePaths3(evs.toDF(), minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(sup2.toSeq === Seq(("A", "B", "C")))
  }

  test("stream-static enrichment parity: streamed join equals batch join") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val dim = ev.select(col("event_type")).distinct()
      .select(col("event_type"),
        (length(col("event_type")) % 3).cast("long").as("tier"))
    val streamed = EventPipeline.streamedStaticEnrichParity(spark, ev, dim)
      .orderBy("tier").collect().toSeq
    val batch = ev.join(dim, "event_type")
      .groupBy("tier")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("tier").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("holtSmoothed: hand-computed level/trend recurrence") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val ev = Seq(
      (1L, ts(0), 10L, "c", 4.0, "{}"),
      (1L, ts(1), 11L, "c", 8.0, "{}"),
      (1L, ts(2), 12L, "c", 6.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    val got = EventPipeline.holtSmoothed(ev)
      .orderBy("event_id")
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // l1=4, t1=0; l2=8*.5+(4+0)*.5=6, t2=(6-4)*.5+0*.5=1;
    // l3=6*.5+(6+1)*.5=6.5, t3=(6.5-6)*.5+1*.5=0.75
    assert(got(0) === ((4.0, 0.0, 4.0)))
    assert(got(1) === ((6.0, 1.0, 7.0)))
    assert(got(2) === ((6.5, 0.75, 7.25)))
  }

  test("holtSmoothed: deterministic across partitionings") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val a = EventPipeline.holtSmoothed(ev.repartition(1))
      .orderBy("user_id", "event_id").collect().toSeq
    val b = EventPipeline.holtSmoothed(ev.repartition(17))
      .orderBy("user_id", "event_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("theilSenTrend: median pairwise slope shrugs off the outlier hour OLS can't") {
    import spark.implicits._
    // hourly counts 1,2,3,4,100 — 9 of 10 pairwise slopes touching
    // only the linear part are 1.0, so the median is exactly 1.0;
    // OLS through the same points would report slope ≈ 19
    val evs = (0 until 5).flatMap { h =>
      val n = if (h == 4) 100 else h + 1
      (0 until n).map(i =>
        Ev(h * 1000 + i, t(h, 1), 100, "view", 1.0, "{}"))
    }
    val got = EventPipeline.theilSenTrend(evs.toDF()).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(1) === 1.0)
    assert(got.head.getLong(2) === 10L)
    // span guard errors loudly instead of building a silent 77M-pair grid
    intercept[IllegalArgumentException] {
      EventPipeline.theilSenTrend(evs.toDF(), maxHours = 2L)
    }
  }

  test("mannKendallTrend: exact S/var18 with tie correction; all-tied series scores z = 0") {
    import spark.implicits._
    // "view": hourly counts 1,2,3,4,100 — every pair increases, so
    // S = 10, no ties → var18 = 5·4·15 = 300, z = 9/sqrt(300/18),
    // tau = 2·10/(5·4) = 1.  "click": counts 2,2,2 — one tie group of
    // 3 → tie18 = 66 = n(n−1)(2n+5), var18 = 0 → z = 0 exactly.
    val evs = (0 until 5).flatMap { h =>
      val n = if (h == 4) 100 else h + 1
      (0 until n).map(i => Ev(h * 1000 + i, t(h, 1), 100, "view", 1.0, "{}"))
    } ++ (0 until 3).flatMap { h =>
      (0 until 2).map(i => Ev(90000 + h * 10 + i, t(h, 1), 200, "click", 1.0, "{}"))
    }
    val got = EventPipeline.mannKendallTrend(evs.toDF())
      .orderBy("event_type").collect()
    assert(got.length === 2)
    val click = got(0)
    assert(click.getLong(1) === 0L)     // S
    assert(click.getLong(2) === 3L)     // n_hours
    assert(click.getLong(3) === 0L)     // var18
    assert(click.getDouble(4) === 0.0)  // z
    val view = got(1)
    assert(view.getLong(1) === 10L)
    assert(view.getLong(2) === 5L)
    assert(view.getLong(3) === 300L)
    assert(view.getDouble(4) ===
      BigDecimal(9.0 / math.sqrt(300.0 / 18.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(view.getDouble(5) === 1.0)   // tau
  }

  test("binarySegmentation: level shift found exactly; uniform halves tie to first pos") {
    import spark.implicits._
    // hourly counts 10,10,10,10,50,50,50,50 — the level-1 split is
    // after hour 3 (pos 4); both halves are uniform, so level-2
    // gains are all 0 and the position tie-break picks the first
    // valid split in each half (pos 1 and pos 5).
    val evs = (0 until 8).flatMap { h =>
      val n = if (h < 4) 10 else 50
      (0 until n).map(i => Ev(h * 1000 + i, t(h, 1), 100, "view", 1.0, "{}"))
    }
    val got = EventPipeline.binarySegmentation(evs.toDF(), levels = 2)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString.substring(11, 13),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "03", 8L),   // split after hour 03, full 8-hour segment
      (2L, "00", 4L),   // left half, first-pos tie-break
      (2L, "04", 4L)))  // right half
  }

  test("sessionizeStream: in-batch closes emit immediately; timeout closure is strict ms") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // user 100: events at 0:10, 0:20 (one session), then 1:05 — gap
    // 45 min > 600 s closes session 1 in-batch. user 101: one event.
    val input = MemoryStream[Ev]
    val q = EventPipeline.sessionizeStream(input.toDF(),
        gapSeconds = 600, watermark = "0 seconds")
      .toDF()
      .writeStream.format("memory").queryName("ev_sess")
      .outputMode("append").start()
    try {
      input.addData(toyEvents)
      q.processAllAvailable()
      val afterBatch = spark.table("ev_sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(3), r.getDouble(4))).toSet
      // only the in-batch-closed session emits: 100's (0:10..0:20);
      // 100's open 1:05 and 101's 0:30 wait in state (watermark = 1:05,
      // timeouts 1:15 / 0:40 — 0:40 < 1:05 fires for 101 in the no-data
      // flush batch, which processAllAvailable includes)
      assert(afterBatch === Set(
        (100L, t(0, 10), 2L, 4.0),
        (101L, t(0, 30), 1L, 10.0)))
      // boundary pin: an event at exactly (last + gap) from another
      // user puts the watermark AT 100's timeout — strict <, no fire
      input.addData(Ev(9, t(1, 15), 102, "view", 1.0, "{}"))
      q.processAllAvailable()
      assert(!spark.table("ev_sess").collect()
        .exists(r => r.getLong(0) == 100L && r.getTimestamp(1) == t(1, 5)))
      // one ms past the boundary → fires
      input.addData(Ev(10, new Timestamp(t(1, 15).getTime + 1L),
        102, "view", 1.0, "{}"))
      q.processAllAvailable()
      val fired = spark.table("ev_sess").collect()
        .filter(r => r.getLong(0) == 100L && r.getTimestamp(1) == t(1, 5))
      assert(fired.length === 1 && fired.head.getLong(3) === 1L)
    } finally q.stop()
  }

  test("sessionizeTws: transformWithState matches the flatMapGroupsWithState semantics") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val q = EventPipeline.sessionizeTws(input.toDF(),
        gapSeconds = 600, watermark = "0 seconds")
      .toDF()
      .writeStream.format("memory").queryName("ev_tws")
      .outputMode("append").start()
    try {
      input.addData(toyEvents)
      q.processAllAvailable()
      val afterBatch = spark.table("ev_tws")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(3), r.getDouble(4))).toSet
      assert(afterBatch === Set(
        (100L, t(0, 10), 2L, 4.0),
        (101L, t(0, 30), 1L, 10.0)))
      // boundary: unlike flatMapGroupsWithState's strict <, TWS timers
      // fire when expiry <= watermark — AT equality the session emits.
      // (A real API difference; each driver oracle encodes its own rule.)
      input.addData(Ev(9, t(1, 15), 102, "view", 1.0, "{}"))
      q.processAllAvailable()
      assert(spark.table("ev_tws").collect()
        .count(r => r.getLong(0) == 100L && r.getTimestamp(1) == t(1, 5)) === 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
