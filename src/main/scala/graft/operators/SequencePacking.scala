package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for pretraining data prep: documents are
 * concatenated in a deterministic order within each shard and cut into
 * fixed-size context windows; each document is labeled with its byte/
 * token offset in the shard stream and the context window ("pack") its
 * first token lands in. This is the streaming-concatenation packing
 * every LLM pretraining pipeline performs — made a deterministic,
 * verifiable relational operator instead of a loader-side loop.
 *
 * Shape at scale: ONE window running-sum per shard (a single shuffle on
 * the shard key, in-partition sort on the order key). Shards are the
 * parallelism unit — exactly how a 100 TB corpus is already laid out
 * (source/date/bucket directories); a shard's stream must fit one
 * task's sort, which holds whenever shards are sized for HDFS-style
 * files. The assignment is a pure function of (shard, order, lengths),
 * so re-runs, re-partitions, and engine ports agree bit-for-bit.
 */
object SequencePacking {

  /**
   * @param docs     corpus with a per-row length column
   * @param shardCol stream is formed per shard (e.g. source)
   * @param orderCol deterministic order within the shard (e.g. doc id)
   * @param lenCol   per-row token/byte length
   * @param ctxLen   context window size
   * @return input plus `stream_offset` (where this row starts in its
   *         shard's concatenated stream), `pack_id` (the window its
   *         first token lands in), `pack_offset` (position within that
   *         window).
   */
  def packSequences(
      docs: DataFrame, shardCol: String, orderCol: String,
      lenCol: String, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    // explicit ROWS frame: the default RANGE frame would give tied
    // order keys the same cumulative sum — a silent mis-pack if the
    // order key is ever non-unique
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("stream_offset",
        coalesce(sum(col(lenCol)).over(w) - col(lenCol), lit(0L)).cast("long"))
      .withColumn("pack_id", floor(col("stream_offset") / ctxLen).cast("long"))
      .withColumn("pack_offset", (col("stream_offset") % ctxLen).cast("long"))
  }
}
