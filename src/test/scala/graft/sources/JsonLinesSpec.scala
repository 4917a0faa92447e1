package graft.sources

import graft.SparkFunSuite

/** JSONL triage: hand-counted census over a mixed dump, malformed
  * accounting, schema card dominance/monomorphism, and the
  * no-malformed case omitting the sentinel row. */
class JsonLinesSpec extends SparkFunSuite {
  import spark.implicits._

  private val dump = Seq(
    """{"id": 1, "v": 10}""",
    """{"id": 2, "v": "ten"}""",
    """{"id": 3, "v": 30, "extra": [1]}""",
    """{"id": 4}""",
    """not json at all""",
    """{"id": 5, "v":""").toDF("line")

  test("field census counts (key, type) pairs and malformed lines") {
    val got = JsonLines.fieldCensus(dump, "line")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("__malformed__", "invalid", 2L),
      ("extra", "array", 1L),
      ("id", "number", 4L),
      ("v", "number", 2L),
      ("v", "string", 1L)))
  }

  test("schema card: presence, type arity, dominant type, monomorphism") {
    val got = JsonLines.schemaCard(dump, "line")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getBoolean(4))).toSeq
    assert(got === Seq(
      ("extra", 1L, 1L, "array", true),
      ("id", 4L, 1L, "number", true),
      ("v", 3L, 2L, "number", false)))
  }

  test("clean dump emits no malformed sentinel") {
    val clean = Seq("""{"a": 1}""", """{"a": 2}""").toDF("line")
    val got = JsonLines.fieldCensus(clean, "line")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", "number", 2L)))
  }

  test("dominant-type tie breaks to the lexicographically smaller type") {
    val tied = Seq("""{"v": 1}""", """{"v": "s"}""").toDF("line")
    val got = JsonLines.schemaCard(tied, "line").collect()(0)
    assert(got.getString(3) === "number")
    assert(!got.getBoolean(4))
  }
}
