package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Priority sampling + Hamilton apportionment: weight-proportional
  * selection statistics, mergeability, exact budget conservation,
  * and the no-global-sort / no-window plan shapes. */
class PrioritySampleSpec extends SparkFunSuite {
  import spark.implicits._

  test("prioritySample: deterministic, weight-biased, ties broken by id") {
    val df = (0L until 2000L).map(i =>
      (i, if (i < 1000) 1L else 20L)).toDF("id", "w")
    val a = DatasetSplit.prioritySample(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    val b = DatasetSplit.prioritySample(df.repartition(11), "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // 20x weight -> heavy ids dominate the sample
    val heavy = a.count(_ >= 1000L)
    assert(heavy > 80, s"only $heavy heavy ids of 100")
  }

  test("prioritySample: zero-weight rows can never outrank positive weights") {
    val df = ((0L until 50L).map(i => (i, 0L)) ++
      (50L until 60L).map(i => (i, 5L))).toDF("id", "w")
    val got = DatasetSplit.prioritySample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got === (50L until 60L).toSet)
  }

  test("prioritySample: plan is TakeOrderedAndProject, not a global sort") {
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("w"))
    val plan = DatasetSplit.prioritySample(df, "id", "w", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("apportion: allocations sum EXACTLY to the budget, proportionality holds") {
    val df = (0 until 997).map { i =>
      (i, if (i < 500) "en" else if (i < 800) "de"
      else if (i < 950) "fr" else "zh")
    }.toDF("id", "lang")
    val got = MixtureSampling.apportion(df, "lang", n = 100)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(5)))).toMap
    assert(got.values.map(_._2).sum === 100L)
    // quotas: en 50.15, de 30.09, fr 15.04, zh 4.71 -> floors 50/30/15/4
    // = 99; the one leftover goes to the largest remainder (zh, .71)
    assert(got("en")._2 === 50L && got("de")._2 === 30L)
    assert(got("fr")._2 === 15L && got("zh")._2 === 5L)
  }

  test("apportion: ties on remainder go to the least stratum; no WindowExec") {
    val df = (0 until 30).map(i =>
      (i, Seq("a", "b", "c")(i % 3))).toDF("id", "lang")
    val out = MixtureSampling.apportion(df, "lang", n = 10)
    // 10 slots over 3 equal strata: quotas 3.33.. -> base 3+3+3,
    // leftover 1 with all remainders equal -> least stratum "a" wins
    val got = out.collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    assert(!out.queryExecution.executedPlan.toString.contains("WindowExec"))
  }
}
