package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * The per-row curation operators are stateless projections, so the SAME
 * transform definition runs on a stream — a 100 TB backfill and the
 * live ingest tail share one code path. These tests pin that: each op
 * applied to a MemoryStream produces exactly its batch output.
 */
class StreamingCurationSpec extends SparkFunSuite {

  private val docs = Seq(
    (1L, "reach alice@mail.example.org or 555-0134 at 10.0.0.7"),
    (2L, "spam spam spam spam"),
    (3L, "the quick brown fox and the lazy dog"))

  private def streamed(name: String)(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = op(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      spark.table(name).orderBy("doc_id").collect()
    } finally q.stop()
  }

  private def batch(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    op(docs.toDF("doc_id", "text")).orderBy("doc_id").collect()
  }

  test("Pii.scrub runs unchanged on a stream") {
    val op = (df: org.apache.spark.sql.DataFrame) => Pii.scrub(df, "doc_id", "text")
    assert(streamed("pii_stream")(op).toSeq === batch(op).toSeq)
  }

  test("repetitionStats runs unchanged on a stream") {
    val op = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.repetitionStats(df, "doc_id", "text")
    assert(streamed("rep_stream")(op).toSeq === batch(op).toSeq)
  }

  test("qualityScore runs unchanged on a stream") {
    val op = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.qualityScore(df, "doc_id", "text")
    assert(streamed("qual_stream")(op).toSeq === batch(op).toSeq)
  }

  test("chunkTokens (generate+explode) runs unchanged on a stream") {
    val op = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 3, stride = 2)
    val s = streamed("chunk_stream")(op).map(_.toSeq).sortBy(_.toString)
    val b = batch(op).map(_.toSeq).sortBy(_.toString)
    assert(s.toSeq === b.toSeq)
  }
}
