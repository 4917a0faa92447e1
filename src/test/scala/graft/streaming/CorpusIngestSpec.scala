package graft.streaming

import graft.SparkFunSuite
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/**
 * Streaming incremental-dedup ingestion: the sink must equal the
 * batch [[Dedup.incrementalNew]] anti-join exactly — exact-duplicate
 * arrivals are dropped, novel docs pass, and several micro-batches
 * really ran.
 */
class CorpusIngestSpec extends SparkFunSuite {

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  private lazy val ingested: String = {
    val src = java.nio.file.Files
      .createTempDirectory("cingest_src_spec").toString
    docs.filter(col("doc_id") >= 250).repartition(3)
      .write.mode("overwrite").parquet(src)
    val corpus = java.nio.file.Files
      .createTempDirectory("cingest_corpus_spec").toString
    docs.filter(col("doc_id") < 250)
      .write.mode("overwrite").parquet(corpus)
    val out = java.nio.file.Files
      .createTempDirectory("cingest_store_spec").toString
    CorpusIngest.ingestNovel(spark, src, corpus, "text", out)
    out
  }

  test("streamed sink ≡ batch incrementalNew, several micro-batches ran") {
    val got = spark.read.parquet(ingested)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val want = Dedup.incrementalNew(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
        "doc_id", TextAnalysis.fingerprint(col("text")),
        TextAnalysis.fingerprint(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    val commits = new java.io.File(s"$ingested/_spark_metadata").listFiles()
      .filter(_.getName.matches("\\d+"))
    assert(commits.length >= 3,
      s"expected >=3 micro-batch commits, got ${commits.length}")
  }

  test("an arriving duplicate of a corpus doc is dropped (case-insensitively)") {
    import spark.implicits._
    // synthetic cut: the sf fixtures carry no exact duplicates across
    // the 250 cut, so inject one — including a CASE variant, pinning
    // the fingerprint's lower() semantics
    val corpus = java.nio.file.Files
      .createTempDirectory("cingest_dup_corpus").toString
    Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpus)
    val src = java.nio.file.Files
      .createTempDirectory("cingest_dup_src").toString
    Seq((10L, "ALPHA Beta"), (11L, "gamma delta"), (12L, "fresh text"))
      .toDF("doc_id", "text").repartition(2)
      .write.mode("overwrite").parquet(src)
    val out = java.nio.file.Files
      .createTempDirectory("cingest_dup_store").toString
    CorpusIngest.ingestNovel(spark, src, corpus, "text", out)
    val sunk = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(sunk.toSeq === Seq(12L))
  }
}
