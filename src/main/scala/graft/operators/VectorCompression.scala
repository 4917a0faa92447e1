package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding storage compression: per-vector affine int8 quantization.
 *
 * At 100 TB of float32 embeddings, quantizing to int8 cuts the scan
 * (and shuffle, and cache) volume 4× at a bounded reconstruction error
 * of (max−min)/510 per component — the standard first step before any
 * coarser product quantization. Everything here is built from codegen'd
 * built-ins over one scan: no UDF, no driver action.
 *
 * Determinism note: the quantized level is floor(x + 0.5) rather than
 * round(x) — floor over IEEE doubles is bit-identical on any engine,
 * while round() implementations disagree at representation boundaries
 * (Spark HALF_UPs the shortest decimal representation; DuckDB rounds
 * the binary double).
 */
object VectorCompression {

  /** Quantized level of `v` within [mn, mx]: 0..255. */
  private def level(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L))
      .otherwise(floor((v - mn) * lit(255.0) / (mx - mn) + lit(0.5)))
      .cast("long")

  /**
   * One row per (id, component): the quantized level plus the
   * per-vector range needed to dequantize. Row-exploded (rather than a
   * packed struct) so the driver comparator can hash it; a production
   * sink would pack `q` back into a binary column with
   * `to_binary_vector`-style packing.
   */
  def quantizeToRows(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    emb.select(
      col(idCol).as("id"),
      array_min(v).cast("double").as("mn"),
      array_max(v).cast("double").as("mx"),
      posexplode(v))
      .select(
        col("id"),
        col("pos").cast("long").as("idx"),
        level(col("col").cast("double"), col("mn"), col("mx")).as("qval"))
  }

  /** Dequantized approximation for error analysis in tests:
    * mn + qval · (mx − mn)/255. */
  def dequantized(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    emb.select(col(idCol).as("id"), mn.as("mn"), mx.as("mx"), posexplode(v))
      .select(col("id"), col("pos").cast("long").as("idx"),
        col("col").cast("double").as("orig"),
        (col("mn") + level(col("col").cast("double"), col("mn"), col("mx")) *
          (col("mx") - col("mn")) / lit(255.0)).as("approx"))
  }
}
