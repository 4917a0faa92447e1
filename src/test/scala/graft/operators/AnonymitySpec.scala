package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** k-anonymity card and suppression rewrite: hand-computed risk
  * flags, l-diversity evidence, schema preservation, and the
  * broadcast-join plan shape. */
class AnonymitySpec extends SparkFunSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "web", "aaa"), (2L, "en", "web", "bbb"),
    (3L, "en", "web", "aaa"), // en/web: n=3, 2 distinct texts
    (4L, "de", "web", "ccc"), (5L, "de", "web", "ccc"), // de/web: n=2
    (6L, "fr", "book", "ddd") // singleton → at risk
  ).toDF("doc_id", "lang", "source", "text")

  test("card: sizes, at-risk flags, distinct-content evidence") {
    val got = Anonymity.kAnonymityCard(docs, Seq("lang", "source"), "text", k = 3)
      .orderBy("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("de", "web", 2L, 1L, true),
      ("en", "web", 3L, 2L, false),
      ("fr", "book", 1L, 1L, true)))
  }

  test("suppress: small groups blanked, schema and payload intact") {
    val out = Anonymity.suppressSmallGroups(docs, Seq("lang", "source"), k = 3)
    assert(out.columns.toSeq === docs.columns.toSeq)
    val got = out.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, "en", "web", "aaa"), (2L, "en", "web", "bbb"), (3L, "en", "web", "aaa"),
      (4L, "*", "*", "ccc"), (5L, "*", "*", "ccc"),
      (6L, "*", "*", "ddd")))
  }

  test("suppress: group-size relation joins back as a broadcast (plan)") {
    val plan = Anonymity.suppressSmallGroups(docs, Seq("lang"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  // --- t-closeness -------------------------------------------------

  private def tRows(rows: Seq[(String, Long)]) =
    rows.toDF("g", "v")

  private def tCard(rows: Seq[(String, Long)], tMicro: Long = 200000L) =
    Anonymity.tClosenessCard(tRows(rows), Seq("g"), "v",
      bucketWidth = 64L, tMicro = tMicro)
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))

  test("t-closeness: symmetric two-bin case, exact micro EMD") {
    // A: bins (3,1), B: bins (1,3); global (4,4), N=8, m=2.
    // EMD(A) = |3/4 - 1/2| = 1/4 → 250000 micro; same for B by symmetry.
    val rows = Seq(
      ("A", 0L), ("A", 1L), ("A", 63L), ("A", 64L),
      ("B", 0L), ("B", 64L), ("B", 100L), ("B", 127L))
    assert(tCard(rows).toSeq === Seq(
      ("A", 4L, 250000L, true), ("B", 4L, 250000L, true)))
    assert(tCard(rows, tMicro = 300000L).map(_._4).toSeq ===
      Seq(false, false))
  }

  test("t-closeness: missing bins fill as zero, truncating division") {
    // A: 2 rows in bin0 only; B: (1,1,2) across bins 0..2.
    // N=6, C=(3,1,2), m=3.
    // A: cums (6,4,0) → s=10 → 1e7 div (2*2*6) = 416666 (truncated)
    // B: cums (-6,-4,0) → s=10 → 1e7 div (2*4*6) = 208333
    val rows = Seq(
      ("A", 0L), ("A", 10L),
      ("B", 0L), ("B", 64L), ("B", 128L), ("B", 130L))
    assert(tCard(rows).toSeq === Seq(
      ("A", 2L, 416666L, true), ("B", 4L, 208333L, true)))
  }

  test("t-closeness: single global bin → EMD 0 for every group") {
    val rows = Seq(("A", 0L), ("A", 1L), ("B", 2L))
    assert(tCard(rows).toSeq === Seq(
      ("A", 2L, 0L, false), ("B", 1L, 0L, false)))
  }

  test("t-closeness: bin domain and totals ride broadcasts (plan)") {
    val plan = Anonymity.tClosenessCard(
      tRows(Seq(("A", 0L), ("B", 64L))), Seq("g"), "v", 64L, 100000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
  }

  test("lDiversityCard: distinct-l passes but entropy-l catches skew") {
    import spark.implicits._
    // group "skewed": 3 distinct langs but 98% one value — distinct
    // pass, entropy fail at l = 3; group "even": 3 equal values, both
    // pass (entropy = log10(3) exactly on the grid)
    val docs = (
      (1 to 98).map(i => ("skewed", "en")) ++ Seq(("skewed", "de"), ("skewed", "fr")) ++
      (1 to 30).flatMap(_ => Seq(("even", "en"), ("even", "de"), ("even", "fr"))))
      .toDF("source", "lang")
    val rows = Anonymity.lDiversityCard(docs, Seq("source"), "lang", l = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(rows("skewed") === ((3L, true, false)))
    assert(rows("even")._2 === true)
    assert(rows("even")._3 === true)
    // even group entropy sits within one micro of the pinned
    // threshold (each log rounds separately before the difference)
    val ent = Anonymity.lDiversityCard(docs, Seq("source"), "lang", 3)
      .filter(org.apache.spark.sql.functions.col("source") === "even")
      .collect().head.getLong(3)
    assert(math.abs(ent - Anonymity.logLMicro(3)) <= 1L, ent.toString)
  }
}
