package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Z-order data layout — the lakehouse OPTIMIZE ZORDER recipe: cluster
 * a table on the Morton interleave of two (quantized) columns so that
 * per-file min-max statistics prune 2-D box predicates. A
 * single-column sort packs tight ranges of its leading column only —
 * a filter on the OTHER column overlaps every file; the z-order sort
 * keeps both columns' ranges locally tight, so a box query touches
 * O(perimeter) files instead of all of them. This is a LAYOUT
 * operator: it changes which bytes a scan reads, never a result.
 *
 * 100 TB shape: one `repartitionByRange` on the z-key (a range
 * exchange with sampled bounds — the same cost as any table-wide
 * sort-write) and a per-partition sort; the z-key itself is one
 * codegen expression ([[graft.functions.ZOrderKernels.zOrderKey]]).
 * Pruning then happens in the Parquet reader from footer stats alone.
 * [[filePruningStats]] quantifies the benefit the same way a file
 * index would: per-file [min, max] of both columns vs a query box —
 * driver-side metadata arithmetic over one footer-census pass.
 */
object ZOrderLayout {

  /** The z-key column for two non-negative integer columns, each
    * clamped into [0, 2^bits). */
  def zKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    val cap = (1L << bits) - 1
    GraftFunctions.zOrderKey(
      least(greatest(x.cast("long"), lit(0L)), lit(cap)),
      least(greatest(y.cast("long"), lit(0L)), lit(cap)), bits)
  }

  /** Write `df` z-ordered on (xCol, yCol) into `files` files at
    * `path`. Range-partition + in-partition sort on the z-key — the
    * standard clustered-write plan. */
  def write(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      path: String, files: Int): Unit = {
    require(files > 0, s"files must be positive, got $files")
    GraftFunctions.register(df.sparkSession)
    df.withColumn("__z", zKey(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) of two columns — one bounded scan per file,
    * the stand-in for reading footer statistics (exactly what the
    * Parquet reader prunes with). Returns (file, xmin, xmax, ymin,
    * ymax) with one row per data file. */
  def fileStats(
      spark: SparkSession, path: String, xCol: String, yCol: String)
      : DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .groupBy("file")
      .agg(min("__x").as("xmin"), max("__x").as("xmax"),
        min("__y").as("ymin"), max("__y").as("ymax"))

  /** How many files a box query [xLo, xHi] × [yLo, yHi] must touch
    * under this layout: files whose stats ranges overlap the box.
    * Returns (files_total, files_touched). */
  def filePruningStats(
      spark: SparkSession, path: String, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Long, Long) = {
    val stats = fileStats(spark, path, xCol, yCol).cache()
    try {
      val total = stats.count()
      val touched = stats.filter(
        col("xmax") >= xLo && col("xmin") <= xHi &&
          col("ymax") >= yLo && col("ymin") <= yHi).count()
      (total, touched)
    } finally stats.unpersist()
  }
}
