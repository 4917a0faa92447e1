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

  // The recipe operators' row verdicts are pure id functions against a
  // static broadcast plan, so the live ingest tail applies the SAME
  // mixture/epoch decisions as the backfill (stream-static join).
  private val sourced = Seq(
    (1L, "srcA", "a b c d"), (6L, "srcA", "a b c d"), (9L, "srcA", "a b c d"),
    (11L, "srcB", "a b"), (19L, "srcB", "a b"))

  private def streamedSourced(name: String)(
      op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = op(input.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(sourced: _*)
      q.processAllAvailable()
      spark.table(name).collect()
    } finally q.stop()
  }

  test("mixture sampleByPlan runs unchanged on a stream (static plan join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batchDocs = sourced.toDF("doc_id", "source", "text")
    val nTok = size(split(col("text"), " ")).cast("long")
    val plan = MixtureSampling.mixturePlan(
      batchDocs.select(col("source"), col("doc_id"), nTok.as("t")),
      "source", col("t"), tau = 0.5).cache()
    val op = (df: org.apache.spark.sql.DataFrame) =>
      MixtureSampling.sampleByPlan(df, "doc_id", "source", plan)
        .select("doc_id")
    val s = streamedSourced("mix_stream")(op).map(_.getLong(0)).sorted
    val b = op(batchDocs).collect().map(_.getLong(0)).sorted
    assert(s.toSeq === b.toSeq && b.nonEmpty)
  }

  test("incremental dedup gates a stream against static history (anti join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val history = Seq((1L, "seen before"), (2L, "also seen"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = Dedup.incrementalNew(
        input.toDF().toDF("doc_id", "text"), history,
        "doc_id", TextAnalysis.fingerprint(col("text")),
        TextAnalysis.fingerprint(col("text")))
      .select("doc_id")
      .writeStream.format("memory").queryName("incr_stream")
      .outputMode("append").start()
    try {
      input.addData((10L, "SEEN BEFORE"), (11L, "genuinely new"), (12L, "also seen"))
      q.processAllAvailable()
      val kept = spark.table("incr_stream").as[Long].collect().sorted
      assert(kept.toSeq === Seq(11L)) // canonical dups gated, novel survives
    } finally q.stop()
  }

  test("upsampleEpochs runs unchanged on a stream") {
    val op = (df: org.apache.spark.sql.DataFrame) =>
      MixtureSampling.upsampleEpochs(df, "doc_id", "source",
        Map("srcA" -> 1.5, "srcB" -> 0.3)).select("doc_id", "epoch")
    val s = streamedSourced("epoch_stream")(op)
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    import spark.implicits._
    val b = op(sourced.toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(s.toSeq === b.toSeq && b.nonEmpty)
  }
}
