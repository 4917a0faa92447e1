package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
