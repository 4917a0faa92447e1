package graft.streaming

import graft.operators.IvfIndex
import graft.operators.IvfIndex.IvfModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Continuous ANN index maintenance — the streaming half of
 * [[graft.operators.IvfIndex]]'s incremental-append story: a vector
 * stream (new embeddings from an ingestion topic) is assigned to the
 * FROZEN centroids micro-batch by micro-batch and appended to the
 * partitioned on-disk store. The index a search session reads is
 * always complete up to the last committed batch.
 *
 * Scale design: assignment is the codegen'd m=1 `pq_encode`
 * nearest-centroid kernel inside the batch's scan stage (no shuffle,
 * no UDF, no state) and the append writes only NEW files under each
 * cluster's partition directory — the store is append-only, existing
 * files are never rewritten, and searches prune partitions exactly as
 * for a batch-built store. Checkpointing makes the append
 * exactly-once per micro-batch (Spark tracks committed batch ids; a
 * restarted query re-runs only uncommitted batches). Centroid drift
 * is handled by periodic offline re-clustering, like any production
 * IVF deployment — the stream never re-clusters.
 */
object StreamingIndex {

  /**
   * Start appending the vector stream to the partitioned store at
   * `path`. `vecs` must be a STREAMING DataFrame containing `embCol`;
   * all its columns are stored alongside the assigned `cluster_id`.
   */
  def appendStream(
      vecs: DataFrame, embCol: String, model: IvfModel,
      path: String, checkpoint: String): StreamingQuery = {
    require(vecs.isStreaming, "appendStream expects a streaming DataFrame")
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.appendPartitioned(IvfIndex.assignBatch(batch, embCol, model), path)
      }
      .start()
  }
}
