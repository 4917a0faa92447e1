package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching: recall-by-pigeonhole for single edits,
  * distance/similarity values, pair canonicalization, the viral-block
  * cap, and entity clustering through transitive chains. */
class EntityResolutionSpec extends SparkFunSuite {
  import spark.implicits._

  private def records(rows: (Long, String)*) =
    rows.toDF("id", "name")

  test("single-char deletion always links: prefix OR suffix block survives") {
    // edits at the front, middle, and back of a 12-char name
    val base = "abcdefghijkl"
    val rows = Seq((0L, base)) ++ (0 until base.length).map { p =>
      (100L + p, base.substring(0, p) + base.substring(p + 1))
    }
    val pairs = EntityResolution
      .fuzzyPairs(records(rows: _*), "id", "name", maxDist = 1, blockKeyLen = 3)
      .collect()
    // every corrupted copy links back to the original (dist 1)
    val linked = pairs.filter(r => r.getAs[Long]("a_id") == 0L)
      .map(r => r.getAs[Long]("b_id")).toSet
    assert((0 until base.length).forall(p => linked.contains(100L + p)))
  }

  test("distance and similarity columns; canonical a_id < b_id; no dupes") {
    val df = EntityResolution.fuzzyPairs(
      records((1L, "spark engine"), (2L, "spark enginx"), (3L, "zzzz")),
      "id", "name", maxDist = 2, blockKeyLen = 3)
    val rows = df.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("a_id") === 1L && r.getAs[Long]("b_id") === 2L)
    assert(r.getAs[Int]("dist") === 1)
    assert(r.getAs[Double]("sim") === 1.0 - 1.0 / 12.0)
  }

  test("pairs sharing both prefix and suffix blocks appear exactly once") {
    // same prefix3 AND same suffix3 → two block hits, one output pair
    val df = EntityResolution.fuzzyPairs(
      records((1L, "abcXdef"), (2L, "abcYdef")),
      "id", "name", maxDist = 1, blockKeyLen = 3)
    assert(df.count() === 1L)
  }

  test("maxBucket drops viral blocks instead of exploding") {
    // 50 names sharing prefix "aaa" (distinct suffixes): cap 10 kills
    // both the prefix block and any pairing through it
    val rows = (0 until 50).map(i => (i.toLong, f"aaa$i%04d"))
    val capped = EntityResolution.fuzzyPairs(
      records(rows: _*), "id", "name", maxDist = 4, blockKeyLen = 3,
      maxBucket = Some(10))
    assert(capped.count() === 0L)
    val uncapped = EntityResolution.fuzzyPairs(
      records(rows: _*), "id", "name", maxDist = 4, blockKeyLen = 3)
    assert(uncapped.count() > 0L)
  }

  test("resolveEntities: transitive chain collapses to min id; singletons self") {
    // a→b→c chain where a and c are 2 edits apart (only linked via b)
    val df = EntityResolution.resolveEntities(
      records((5L, "hello world"), (6L, "hellx world"), (7L, "hellxxworld"),
        (9L, "unrelated name")),
      "id", "name", maxDist = 1, blockKeyLen = 3)
    val m = df.collect().map(r =>
      r.getAs[Long]("record_id") -> r.getAs[Long]("entity_id")).toMap
    assert(m(5L) === 5L && m(6L) === 5L && m(7L) === 5L)
    assert(m(9L) === 9L)
  }

  test("plan: blocking join is an equality join, not a cartesian") {
    val plan = EntityResolution.fuzzyPairs(
      records((1L, "abcdef"), (2L, "abcdeg")), "id", "name", 2, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
