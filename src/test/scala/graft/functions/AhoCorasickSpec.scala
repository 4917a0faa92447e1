package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick: brute-force cross-check on random inputs, the
  * substring/overlap semantics the automaton exists for, fail-link
  * correctness, and the Spark expression (codegen + broadcast). */
class AhoCorasickSpec extends SparkFunSuite {
  import spark.implicits._

  private def brute(patterns: Seq[String], text: String): (Long, Long) = {
    val per = patterns.map { p =>
      var n = 0L
      var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) } // ALL positions
      n
    }
    (per.sum, per.count(_ > 0).toLong)
  }

  private def scan(patterns: Seq[String], text: String): (Long, Long) = {
    val r = AhoCorasick.scanCounts(AhoCorasick.build(patterns),
      UTF8String.fromString(text))
    (r(0), r(1))
  }

  test("substring patterns both fire; overlapping occurrences all count") {
    val pats = Seq("scan", "slow scan", "aa")
    assert(scan(pats, "a slow scan here") === ((2L, 2L)))
    // "aa" in "aaaa": end positions 1,2,3 -> 3 overlapping matches
    assert(scan(Seq("aa"), "aaaa") === ((3L, 1L)))
    assert(scan(pats, "nothing") === ((0L, 0L)))
  }

  test("fail links: a mismatch mid-pattern still catches the restart") {
    // classic: patterns {he, she, his, hers} on "ushers"
    val pats = Seq("he", "she", "his", "hers")
    assert(scan(pats, "ushers") === ((3L, 3L))) // she, he, hers
  }

  test("matches the brute force on random texts over a small alphabet") {
    val rnd = new scala.util.Random(77)
    val pats = Seq("ab", "aba", "bb", "abab", "ba b", "c")
    (0 until 300).foreach { _ =>
      val text = (0 until rnd.nextInt(60)).map(_ =>
        "ab bc".charAt(rnd.nextInt(5))).mkString
      assert(scan(pats, text) === brute(pats, text), s"text=$text")
    }
  }

  test("null text scans to zero; empty pattern refused") {
    assert(AhoCorasick.scanCounts(AhoCorasick.build(Seq("x")), null)
      .toSeq === Seq(0L, 0L))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("")))
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
  }

  test("expression: codegen-fused, automaton rides the broadcast not the plan") {
    GraftFunctions.register(spark)
    // a deliberately large pattern set: the plan must stay small
    val pats = (0 until 2000).map(i => s"blockphrase$i needle") :+ "dup"
    val bc = spark.sparkContext.broadcast(AhoCorasick.build(pats))
    val tag = AcRegistry.register(bc)
    try {
      // spark.range source: a Seq-literal frame collapses to a
      // LocalTableScan (interpreted eval at plan time), which would
      // dodge the codegen path this test exists to pin
      val df = spark.range(3)
        .select(when(col("id") === 0, "a dup here")
          .when(col("id") === 1, "blockphrase7 needle x")
          .otherwise("clean").as("text"))
        .select(GraftFunctions.acScan(tag, col("text")).as("r"))
        .select(col("r.total_matches"), col("r.distinct_patterns"))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((1L, 1L), (1L, 1L), (0L, 0L)))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty, s"fell out of codegen:\n$plan")
      // the automaton prints as Broadcast(N): none of the 2000 other
      // patterns may appear (blockphrase7 is in the INPUT literal)
      assert(!plan.toString.contains("blockphrase42"),
        "patterns leaked into the plan")
      assert(plan.toString.contains("Broadcast("),
        "expression should carry the broadcast handle")
    } finally AcRegistry.deregister(tag)
  }
}
