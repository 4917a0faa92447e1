package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.IvfIndex

/**
 * Streaming ANN ingestion — the CONTINUOUS version of
 * [[IvfIndex.appendPartitioned]], i.e. the production shape of "new
 * embeddings arrive all day and must become searchable without an
 * index rebuild" (the reference's index is rebuilt offline by a YDB
 * job, /root/reference/app.py:186-196; at 100 TB the ingest is a
 * stream, not a rebuild):
 *
 *  - source: a file stream over embedding batches (one micro-batch
 *    per arriving file — `maxFilesPerTrigger = 1`);
 *  - enrichment: a stream-STATIC join to the metadata table —
 *    stateless (no state store, no watermark), the static side plans
 *    as an ordinary broadcast/shuffle join per micro-batch;
 *  - assignment: nearest FROZEN centroid per row via the codegen m=1
 *    `pq_encode` kernel ([[IvfIndex.assignBatch]]) — scan-local
 *    inside WholeStageCodegen, stateless;
 *  - sink: parquet `writeStream ... partitionBy(cluster_id)` — each
 *    micro-batch's files land under their clusters' partition
 *    directories exactly as the batch append does, so search-time
 *    partition pruning is identical for batch-built and streamed
 *    rows.
 *
 * Every stage is stateless, so the stream needs no state store at
 * all: the only streaming machinery is source offsets + the sink's
 * exactly-once file log. Full-breadth search over the streamed store
 * must equal brute force over the source rows — the IVF exactness
 * escape hatch, and the driver row's oracle; parity of the streamed
 * store against the batch-built one is pinned in `VectorIngestSpec`.
 *
 * The harness runs on a `newSession()` with
 * `spark.sql.shuffle.partitions = 4` (the [[EventPipeline]] streamed
 * rows' deployment-knob convention) and deletes the checkpoint
 * eagerly — a completed AvailableNow ingest leaves nothing to resume.
 */
object VectorIngest {

  def ingestPartitioned(
      spark: SparkSession,
      srcDir: String,
      staticPath: String,
      streamJoinCol: String,
      staticJoinCol: String,
      embCol: String,
      model: IvfIndex.IvfModel,
      outPath: String): Unit = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = s.read.parquet(srcDir).schema
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_vingest_ckpt")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val static = s.read.parquet(staticPath)
    // join on the RESOLVED static column so same-named join keys can't
    // hit an ambiguous-reference error; non-key column names must still
    // be disjoint across the two sides (the parquet sink rejects
    // duplicate output columns), which the callers' schemas guarantee
    val enriched = stream.join(static,
      stream(streamJoinCol) === static(staticJoinCol))
    val assigned = IvfIndex.assignBatch(enriched, embCol, model)
    // checkpoint cleanup in finally: a failed ingest must not leak the
    // temp checkpoint (the partially-written store is the caller's to
    // inspect or delete — its _spark_metadata log stays consistent)
    try {
      val q = assigned.writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt.toString)
        .option("path", outPath)
        .partitionBy(IvfIndex.ClusterCol)
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
