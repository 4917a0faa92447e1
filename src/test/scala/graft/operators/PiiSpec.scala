package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class PiiSpec extends SparkFunSuite {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "reach me at alice.smith+spam@mail-host.example.org today"),
      (2L, "call 555-0134 or 555-9821 now"),
      (3L, "server at 10.0.12.84 and 192.168.1.1 responded"),
      (4L, "nothing sensitive here at all"),
      (5L, "mix bob@x.io then 555-1234 then 172.16.0.9 done")
    ).toDF("doc_id", "text")
  }

  test("scrub counts each PII type independently") {
    val got = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(2L) === ((0L, 2L, 0L)))
    assert(got(3L) === ((0L, 0L, 2L)))
    assert(got(4L) === ((0L, 0L, 0L)))
    assert(got(5L) === ((1L, 1L, 1L)))
  }

  test("redact replaces every match with its typed token") {
    val red = Pii.redact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "reach me at <EMAIL> today")
    assert(red(2L) === "call <PHONE> or <PHONE> now")
    assert(red(3L) === "server at <IP> and <IP> responded")
    assert(red(4L) === "nothing sensitive here at all")
    assert(red(5L) === "mix <EMAIL> then <PHONE> then <IP> done")
  }

  test("phone pattern does not fire inside an IP, and redaction order is safe") {
    import spark.implicits._
    // 123-4567 inside an IP-free string matches; the dotted quad never
    // triggers the phone rule (no hyphen), and redaction tokens contain
    // no digits so later passes cannot match inside earlier replacements.
    val d = Seq((1L, "x 123-4567 y 10.20.30.40 z")).toDF("doc_id", "text")
    val r = Pii.scrub(d, "doc_id", "text").head
    assert(r.getLong(2) === 1L && r.getLong(3) === 1L)
    val red = Pii.redact(d, "doc_id", "text").head.getString(1)
    assert(red === "x <PHONE> y <IP> z")
  }

  test("scrub is a single shuffle-free projection (plan)") {
    val plan = Pii.scrub(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("mergeSpans: overlap, containment, adjacency, disjoint — exact") {
    import spark.implicits._
    val spans = Seq(
      (1L, 0L, 5L), (1L, 3L, 9L),    // overlap → [0,9)
      (1L, 9L, 12L),                 // adjacent → extends to [0,12)
      (1L, 20L, 24L),                // disjoint
      (2L, 10L, 30L), (2L, 12L, 15L) // containment → [10,30)
    ).toDF("id", "s", "e")
    val merged = Pii.mergeSpans(spans, "id", "s", "e")
      .orderBy("id", "start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq === Seq((1L, 0L, 12L), (1L, 20L, 24L),
      (2L, 10L, 30L)))
    val card = Pii.spanMergeCard(spans, "id", "s", "e")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(card.toSeq === Seq((1L, 4L, 2L, 16L), (2L, 2L, 1L, 20L)))
  }
}
