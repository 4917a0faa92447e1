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
}
