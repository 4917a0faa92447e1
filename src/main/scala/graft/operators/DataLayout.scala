package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) clustering keys for
 * multi-dimensional data skipping.
 *
 * Parquet scans prune row groups (and whole files, via partition-less
 * min/max stats) when a filtered column's values are clustered on
 * disk. Sorting by ONE column clusters that column only; interleaving
 * the bits of several quantized columns clusters ALL of them at once —
 * a range predicate on any participating dimension then skips most
 * files. At 100 TB this is the difference between scanning the lake
 * and scanning a sliver, for the price of one sort at write time.
 *
 * Everything is codegen'd built-in bit arithmetic (shift/and/or) — no
 * UDF, no driver action; the key is a pure per-row projection.
 */
object DataLayout {

  /**
   * Morton interleave of the low `bits` bits of each (non-negative,
   * already-quantized) column: bit b of column i lands at output
   * position `b * n + i`. `bits * cols.size` must fit a signed long.
   */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * cols must fit a signed long, got $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /**
   * Write `df` clustered by a Z-order key: range-partition on the key
   * (balanced files), sort within partitions, drop the key from the
   * stored schema. Every participating dimension ends up with tight
   * per-file min/max stats — measured in `DataLayoutSpec`.
   */
  def writeZOrdered(
      df: DataFrame, path: String, key: Column, numFiles: Int): Unit =
    df.withColumn("__graft_zkey", key)
      .repartitionByRange(numFiles, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
      .write.mode("overwrite").parquet(path)

  /**
   * 2-D Hilbert curve index (`bits` bits per dimension) appended as
   * column `out` — the stronger clustering key: unlike Morton order,
   * EVERY unit step along the Hilbert curve is a grid-neighbor step
   * (no diagonal jumps across the key space), so range predicates on
   * either dimension touch fewer, more contiguous files (Faloutsos &
   * Roumeliotis' classic result; the reason Hilbert beats Z-order for
   * clustering whenever the extra arithmetic is affordable — and at
   * write time it always is).
   *
   * The classic iterative xy2d walk (one rotate/reflect per bit
   * plane) unrolls into `bits` NAMED per-stage projections —
   * expression-tree size stays linear (a single nested expression
   * would double per stage), Catalyst collapses the chain into one
   * ProjectExec, and whole-stage codegen CSEs the stage locals. Both
   * input columns must already be quantized to [0, 2^bits).
   */
  def withHilbertKey(
      df: DataFrame, x: Column, y: Column, bits: Int, out: String): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62,
      s"2 * bits must fit a signed long, got bits = $bits")
    val (xc, yc, rxc, ryc, nxc) = ("__h_x", "__h_y", "__h_rx", "__h_ry", "__h_nx")
    var cur = df
      .withColumn(xc, x.cast("long"))
      .withColumn(yc, y.cast("long"))
      .withColumn(out, lit(0L))
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      cur = cur
        .withColumn(rxc, when(col(xc).bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(ryc, when(col(yc).bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col(rxc)).bitwiseXOR(col(ryc)))
        // rotate/reflect the quadrant frame: reflect when rx=1, then
        // swap axes — only in the ry=0 half-planes
        .withColumn(nxc,
          when(col(ryc) === 0,
            when(col(rxc) === 1, lit(s - 1) - col(yc)).otherwise(col(yc)))
            .otherwise(col(xc)))
        .withColumn(yc,
          when(col(ryc) === 0,
            when(col(rxc) === 1, lit(s - 1) - col(xc)).otherwise(col(xc)))
            .otherwise(col(yc)))
        .withColumn(xc, col(nxc))
      i -= 1
    }
    cur.drop(xc, yc, rxc, ryc, nxc)
  }

  /**
   * Small-file compaction planner — the OPTIMIZE bin-packer every
   * lakehouse table needs once streaming/incremental writers have
   * littered it with kilobyte files: assign files to target-size
   * output groups by CUMULATIVE-SIZE binning in a deterministic
   * per-partition order (a file's group is the target-multiple its
   * START offset falls in — Delta/Iceberg OPTIMIZE's per-partition
   * packing, expressible as one window cumsum, no sequential driver
   * loop). Oversized files own their groups naturally.
   *
   * Scale: the inventory is METADATA — one row per file (~10⁵–10⁶
   * rows at 100 TB), never per record — so the per-partition window
   * sort is trivial; the plan's group relation then drives however
   * many real rewrite jobs.
   *
   * Output: one row per (partitionCols..., group_id) with n_files,
   * total_bytes, first_file, last_file.
   */
  def compactionPlan(
      inventory: DataFrame, fileCol: String, bytesCol: String,
      targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = (if (partitionCols.isEmpty)
        Window.partitionBy(lit(0))
      else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withGroup = inventory
      .withColumn("__graft_cum", sum(col(bytesCol)).over(w))
      .withColumn("__graft_grp",
        ((col("__graft_cum") - col(bytesCol)) / lit(targetBytes))
          .cast("long"))
    withGroup
      .groupBy((partitionCols.map(col) :+ col("__graft_grp").as("group_id")): _*)
      .agg(
        count(lit(1)).as("n_files"),
        sum(col(bytesCol)).cast("long").as("total_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
  }
}
