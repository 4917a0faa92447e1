package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class TemporalJoinsSpec extends SparkFunSuite {

  private def t(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("asOfJoin: hand-computed matches, inclusive ties, inner semantics") {
    import spark.implicits._
    val clicks = Seq(
      (1L, t(5), 100L),  // matches view at 10:03
      (1L, t(10), 101L), // matches view at 10:10 (tie → inclusive)
      (2L, t(1), 102L),  // no prior view → dropped
      (2L, t(9), 103L))  // matches view at 10:02
      .toDF("user_id", "ts", "event_id")
    val views = Seq(
      (1L, t(3), 1.5), (1L, t(10), 2.5), (2L, t(2), 9.0))
      .toDF("user_id", "ts", "value")
    val got = TemporalJoins.asOfJoin(clicks, views, "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(2), r.getTimestamp(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (100L, t(3), 1.5),
      (101L, t(10), 2.5),
      (103L, t(2), 9.0)))
  }

  test("asOfJoin carries forward across many rights and resets per key") {
    import spark.implicits._
    val clicks = Seq((1L, t(9), 1L), (9L, t(9), 2L)).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, t(1), 1.0), (1L, t(8), 8.0), (9L, t(7), 7.0))
      .toDF("user_id", "ts", "value")
    val got = TemporalJoins.asOfJoin(clicks, views, "user_id", "ts", Seq("value"))
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(got === Map(1L -> 8.0, 2L -> 7.0))
  }

  test("rangeSelfJoin equals the brute-force range predicate") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val ev = (0 until 300).map { i =>
      (i.toLong, (i % 7).toLong, new Timestamp(1704100000000L + rng.nextInt(3600) * 1000L))
    }.toDF("event_id", "user_id", "ts")
    val got = TemporalJoins.rangeSelfJoin(ev, "user_id", "ts", "event_id", 120)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.select(col("user_id").as("u"), col("ts").as("a_ts"), col("event_id").as("a_id"))
    val b = ev.select(col("user_id").as("u2"), col("ts").as("b_ts"), col("event_id").as("b_id"))
    val brute = a.join(b, col("u") === col("u2") &&
        col("b_ts") > col("a_ts") &&
        unix_micros(col("b_ts")) - unix_micros(col("a_ts")) <= 120L * 1000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("range join plan is an equality join, not a cartesian") {
    import spark.implicits._
    val ev = Seq((1L, 1L, t(0))).toDF("event_id", "user_id", "ts")
    val plan = TemporalJoins.rangeSelfJoin(ev, "user_id", "ts", "event_id", 60)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
