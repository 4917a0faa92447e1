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

  test("comparisonPatterns: exact agreement-vector counts on a known block") {
    // two 16-char names sharing prefix-8 but not suffix-8, same
    // length -> pattern (1,0,1); an exact duplicate pair -> (1,1,1)
    val pats = EntityResolution.comparisonPatterns(
      records(
        (1L, "aaaabbbbccccdddd"), (2L, "aaaabbbbcccceeee"),
        (3L, "zzzzyyyyxxxxwwww"), (4L, "zzzzyyyyxxxxwwww")),
      "id", "name", blockKeyLen = 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    assert(pats === Map((1, 0, 1) -> 1L, (1, 1, 1) -> 1L))
  }

  test("fsFit: EM separates a clean two-pattern mixture; order-invariant") {
    // 100 all-agree pairs (matches) vs 900 all-disagree pairs
    val rows = Seq((1, 1, 1, 100L), (0, 0, 0, 900L))
    val fit = EntityResolution.fsFit(rows)
    fit.mMicro.foreach(m => assert(m > 990000L))
    fit.uMicro.foreach(u => assert(u < 10000L))
    assert(fit.pMicro > 95000L && fit.pMicro < 105000L)
    // symmetric fields get identical parameters
    assert(fit.mMicro.distinct.size === 1 && fit.uMicro.distinct.size === 1)
    // integer sums + integral divisions: input order cannot matter
    assert(EntityResolution.fsFit(rows.reverse) === fit)
  }

  test("fsPatterns/fsWeights: posteriors ordered by evidence, weights signed") {
    val rows = Seq((1, 1, 1, 100L), (1, 0, 1, 50L), (0, 0, 0, 900L))
    val fit = EntityResolution.fsFit(rows)
    val pats = EntityResolution.fsPatterns(
      rows.toDF("g1", "g2", "g3", "n_pairs"), fit)
      .orderBy(desc("w_micro")).collect()
    val byPat = pats.map(r =>
      ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(4))).toMap
    // EM separates this mixture sharply enough that both match-heavy
    // patterns can saturate the micro grid — require order, not strict
    assert(byPat((1, 1, 1)) >= byPat((1, 0, 1)))
    assert(byPat((1, 0, 1)) > byPat((0, 0, 0)))
    assert(byPat((1, 1, 1)) > 900000L)
    assert(byPat((0, 0, 0)) < 100000L)
    val ws = EntityResolution.fsWeights(spark, fit).collect()
    ws.foreach { r =>
      assert(r.getDouble(3) > 0.0, "agree weight positive")
      assert(r.getDouble(4) < 0.0, "disagree weight negative")
    }
  }

  test("jaroWinkler kernel: pinned to DuckDB's jaro_winkler_similarity") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      BigDecimal(graft.functions.TextHashKernels.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // every expected value probed from DuckDB this round
    assert(jw("MARTHA", "MARHTA") === 0.961111)
    assert(jw("DIXON", "DICKSONX") === 0.813333)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.896296)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "") === 0.0)           // DuckDB: both-empty is 0
    assert(jw("", "a") === 0.0)
    assert(jw("ab", "ba") === 0.0)       // window 0: no cross match
    assert(jw("héllo", "hello") === 0.84) // BYTE units, like DuckDB
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6) // boost gated at jaro > 0.7
    assert(jw("aaaaaaaaax", "aaaaaaaaay") === 0.96) // prefix capped at 4
    assert(jw("ab", "abcdefgh") === 0.8)
  }

  test("jaroPairs: blocked verification keeps single-deletion twins") {
    val base = "abcdefghijklmnopqrstuvwx"
    val pairs = EntityResolution.jaroPairs(
      records((1L, base), (2L, base.substring(0, 10) + base.substring(11)),
        (9L, "totally different name!!")),
      "id", "name", minSim = 0.9, blockKeyLen = 8).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("a_id") === 1L)
    assert(pairs.head.getAs[Double]("jw") > 0.94)
  }

  test("jaro_winkler expression: interpreted and codegen agree") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("héllo", "hello"), ("ab", "ba"),
      ("", ""), ("abcdxxxxxx", "abcdyyyyyy")).toDF("a", "b")
    def run(mode: String): Seq[Double] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(graft.functions.GraftFunctions.jaroWinkler(col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("NO_CODEGEN") === run("CODEGEN_ONLY"))
  }

  test("plan: blocking join is an equality join, not a cartesian") {
    val plan = EntityResolution.fuzzyPairs(
      records((1L, "abcdef"), (2L, "abcdeg")), "id", "name", 2, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
