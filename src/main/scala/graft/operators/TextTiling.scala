package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TextTiling segmentation (Hearst 1997, the block-comparison form) —
 * topical chunking for RAG / long-context preparation: split each
 * document where LEXICAL COHESION between adjacent fixed-size token
 * blocks drops, instead of at arbitrary byte offsets. A chunk that
 * respects topic boundaries embeds and retrieves better than a
 * blind 512-token slice; this is the deterministic, model-free
 * version of "semantic chunking" (the embedding-cosine variant is
 * the same pipeline with [[BitextMining]]-style micro-cosines in
 * place of Jaccard).
 *
 * Cohesion is the Jaccard similarity of adjacent blocks' DISTINCT
 * token sets, micro-quantized to an integer grid
 * (1e6·|A∩B| div |A∪B|) — exact under any partitioning and
 * replayable by a SQL oracle. A boundary opens where cohesion falls
 * below `thresholdMicro`; segments are the runs between boundaries.
 *
 * Scale shape: everything up to the boundary flags is scan-local
 * per-document array work (split, slice, set ops — codegen'd); the
 * one window (running boundary count → segment id) and the final
 * aggregate are PARTITIONED by document, bounded by a document's
 * block count, never a global sort.
 */
object TextTiling {

  /**
   * @param blockTokens tokens per comparison block
   * @param thresholdMicro boundary when jaccard_micro < this
   * @return one row per (id, segment): seg_id (0-based), first_block,
   *         n_blocks, n_tokens
   */
  def segments(
      df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 8, thresholdMicro: Long = 150000L): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .withColumn("n_blocks",
        ceil(size(col("toks")) / lit(blockTokens.toDouble)).cast("int"))
      .filter(col("n_blocks") >= 1)

    val blocks = toks
      .select(col("id"), col("toks"), col("n_blocks"),
        explode(sequence(lit(0), col("n_blocks") - 1)).as("block_idx"))
      .select(col("id"), col("block_idx"),
        expr(s"slice(toks, block_idx * $blockTokens + 1, $blockTokens)")
          .as("block"))
      .withColumn("n_tok", size(col("block")))
      .withColumn("tset", array_distinct(col("block")))

    // cohesion with the PREVIOUS block; the first block opens segment 0
    val prev = blocks.select(col("id"), (col("block_idx") + 1).as("block_idx"),
      col("tset").as("prev_tset"))
    val flagged = blocks
      .join(prev, Seq("id", "block_idx"), "left")
      .withColumn("jacc_micro",
        when(col("prev_tset").isNull, lit(null))
          .otherwise(expr(
            "(1000000 * size(array_intersect(tset, prev_tset))) div " +
              "size(array_union(tset, prev_tset))")))
      .withColumn("boundary",
        when(col("prev_tset").isNull, 0L)
          .when(col("jacc_micro") < thresholdMicro, 1L)
          .otherwise(0L))

    val w = Window.partitionBy("id").orderBy("block_idx")
    flagged
      .withColumn("seg_id", sum(col("boundary")).over(w))
      .groupBy("id", "seg_id")
      .agg(min(col("block_idx")).cast("long").as("first_block"),
        count(lit(1)).as("n_blocks"),
        sum(col("n_tok")).as("n_tokens"))
  }
}
