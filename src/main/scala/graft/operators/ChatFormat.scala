package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Conversation (SFT) data preparation — the formatting stage between a
 * raw turns relation and a trainable text column: render each
 * conversation through a fixed role-marker template and emit the
 * loss-mask boundary (train on the final assistant response only, the
 * standard SFT recipe).
 *
 * Template (ChatML-shaped, public convention):
 * `<|im_start|>ROLE\nCONTENT<|im_end|>\n` per turn, concatenated in
 * turn order. `mask_from` is the 1-based char offset of the LAST
 * assistant turn's content — everything before it is prompt
 * (loss-masked), everything from it to the final `<|im_end|>` is the
 * supervised target.
 *
 * Scale shape: one `groupBy(conv_id)` with `collect_list` of
 * (turn_idx, role, content) structs, sorted and folded INSIDE the
 * aggregate row — conversations are the natural unit here and are
 * bounded (chat data is ~10² turns, not 10⁶; a runaway conversation
 * is a data bug the expectations suite catches, same contract as
 * [[SequencePacking]]). One shuffle by conv_id, everything else
 * scan-local; no window, no self-join, no driver loop.
 */
object ChatFormat {

  private val Start = "<|im_start|>"
  private val End = "<|im_end|>"

  /**
   * Render conversations: (conv_id, n_turns, text, mask_from,
   * target_len). Conversations without an assistant turn render with
   * mask_from = 0 (nothing to train on; the caller filters).
   *
   * @param turns (convCol, idxCol, roleCol, contentCol)
   */
  def render(
      turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String): DataFrame = {
    val t = array_sort(collect_list(struct(
      col(idxCol).cast("long").as("i"),
      col(roleCol).as("r"),
      col(contentCol).as("c"))))
    // rendered turn: <|im_start|>role\ncontent<|im_end|>\n
    def turnText(x: org.apache.spark.sql.Column) = concat(
      lit(Start), x.getField("r"), lit("\n"),
      x.getField("c"), lit(End), lit("\n"))
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(t.as("ts"))
      .select(
        col("conv_id"),
        size(col("ts")).cast("long").as("n_turns"),
        concat_ws("", transform(col("ts"), turnText _)).as("text"),
        col("ts"))
      // last assistant turn index (position in the sorted array, 1-based)
      .withColumn("last_asst",
        aggregate(
          transform(col("ts"), (x, i) =>
            when(x.getField("r") === "assistant", i + 1).otherwise(0)),
          lit(0), (acc, v) => greatest(acc, v)))
      .withColumn("mask_from",
        when(col("last_asst") === 0, lit(0L)).otherwise(
          // chars of all turns before the last assistant turn, plus
          // that turn's <|im_start|>assistant\n header, plus 1
          length(concat_ws("",
            transform(slice(col("ts"), lit(1), col("last_asst") - 1), turnText _)))
            .cast("long")
            + lit(Start.length + "assistant".length + 1).cast("long") + 1L))
      .withColumn("target_len",
        when(col("last_asst") === 0, lit(0L)).otherwise(
          length(element_at(col("ts"), col("last_asst")).getField("c")).cast("long")))
      .select("conv_id", "n_turns", "text", "mask_from", "target_len")
  }
}
