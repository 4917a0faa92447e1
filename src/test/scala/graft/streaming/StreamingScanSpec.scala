package graft.streaming

import graft.SparkFunSuite
import graft.functions.{AcRegistry, AhoCorasick, GraftFunctions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class StreamedDoc(doc_id: Long, text: String)

/** Broadcast-automaton blocklist scanning in Structured Streaming:
  * the SAME ac_scan expression (broadcast handle in the plan) runs
  * per micro-batch, and streamed verdicts equal the batch run over
  * the union of the batches — the property that lets a live ingest
  * gate share one automaton with the backfill job. */
class StreamingScanSpec extends SparkFunSuite {

  test("streamed ac_scan verdicts equal the batch verdicts") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bc = spark.sparkContext.broadcast(
      AhoCorasick.build(Seq("dup", "slow scan", "hash")))
    val tag = AcRegistry.register(bc)
    try {
      val docs = Seq(
        StreamedDoc(1L, "a dup and a slow scan"),
        StreamedDoc(2L, "hash hash hash"),
        StreamedDoc(3L, "clean text"),
        StreamedDoc(4L, "dedup counts too"))
      def scanned(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), GraftFunctions.acScan(tag, col("text")).as("r"))
        .select(col("doc_id"), col("r.total_matches"), col("r.distinct_patterns"))

      implicit val ctx = spark.sqlContext
      val input = MemoryStream[StreamedDoc]
      val query = scanned(input.toDF())
        .writeStream.format("memory").queryName("ac_stream")
        .outputMode("append").start()
      input.addData(docs.take(2))
      query.processAllAvailable()
      input.addData(docs.drop(2))
      query.processAllAvailable()
      query.stop()

      val streamed = spark.table("ac_stream")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val batch = scanned(docs.toDF())
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      // and the verdicts themselves are right ("dup" inside "dedup")
      assert(batch.map(r => (r(0), r(1))) ===
        Seq((1L, 2L), (2L, 3L), (3L, 0L), (4L, 1L)))
    } finally AcRegistry.deregister(tag)
  }
}
