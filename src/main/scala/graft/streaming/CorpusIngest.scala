package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextAnalysis

/**
 * Streaming incremental-dedup ingestion — the CONTINUOUS form of
 * [[graft.operators.Dedup.incrementalNew]], i.e. the daily-ingest
 * gate run as a stream: new documents arrive as a file stream, each
 * micro-batch anti-joins on content fingerprint
 * ([[TextAnalysis.fingerprint]] — md5 of the lowercased text) against
 * the STATIC corpus fingerprint relation, and only novel documents
 * land in the clean-store sink.
 *
 * Stateless end to end: the stream-static LEFT ANTI join needs no
 * state store and no watermark (the corpus side is a slim fingerprint
 * projection re-read per micro-batch — at 100 TB that side is a
 * broadcast or a bucketed-store probe, never a corpus shuffle).
 * WITHIN-stream duplicates are deliberately out of scope here — that
 * is the streaming `dropDuplicates` mode's job
 * ([[EventPipeline]]'s dedup surface, state-store backed); composing
 * both gives the full production gate.
 *
 * The sink's content must equal the batch `incrementalNew` result on
 * the same inputs — `CorpusIngestSpec` pins that parity, and the
 * driver row shares the batch row's oracle.
 */
object CorpusIngest {

  def ingestNovel(
      spark: SparkSession,
      srcDir: String,
      corpusPath: String,
      textCol: String,
      outPath: String): Unit = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = s.read.parquet(srcDir).schema
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_cingest_ckpt")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val corpusFp = s.read.parquet(corpusPath)
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    val novel = stream
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(corpusFp, Seq("__fp"), "left_anti")
      .drop("__fp")
    try {
      val q = novel.writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt.toString)
        .option("path", outPath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      val walk = java.nio.file.Files.walk(ckpt)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
