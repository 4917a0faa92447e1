package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: flagship entry + queries/oracles consistency. */
class SparkEntrySpec extends SparkFunSuite {

  test("entry: flagship cosine top-4 on sf0.001 returns rows (driver smoke)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 4)
    assert(rows.head.getString(0) === "0") // self-match first
  }

  test("every oracle key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
