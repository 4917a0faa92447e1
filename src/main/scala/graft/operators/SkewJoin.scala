package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit key-salting for pathologically skewed equality joins.
 *
 * AQE's skew-join handles moderate skew by splitting oversized shuffle
 * partitions, but a single join KEY hotter than an entire executor (a
 * viral duplicate fingerprint, an LSH bucket of boilerplate documents)
 * still lands on one task. Salting splits each hot key into `buckets`
 * sub-keys and replicates the other side's rows FOR THAT KEY once per
 * bucket — one hot reducer becomes `buckets` even ones.
 *
 * Only the hot keys are salted: the skewed side is split into a hot and
 * a cold slice (broadcast semi/anti join against the small hot-key set),
 * the cold remainder joins plainly, and the union of the two is exactly
 * the unsalted inner join. Replication cost is therefore bounded by
 * `buckets × |other rows with a hot key|`, not `buckets × |other|`.
 *
 * The salt assignment on the skewed side is arbitrary by construction —
 * any row may land in any bucket — so the inner-join result is identical
 * to the unsalted join. (Degenerate case: fully identical hot-side rows
 * hash to one bucket; include a row-id column if that matters.)
 */
object SkewJoin {

  /**
   * Keys of `df` with more than `minCount` rows — the hot set. One hash
   * aggregate with map-side partial counts; the output is keys-only and
   * small by construction (only a handful of keys can exceed a
   * reducer-sized count), which is what makes it broadcast-able.
   */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") > minCount)
      .select(col(key))

  /** Skew-aware inner join: detect hot keys on the skewed side (keys with
    * more than `hotKeyMinCount` rows), salt only those. */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      buckets: Int,
      hotKeyMinCount: Long = 1000L): DataFrame =
    saltedInnerJoin(skewed, other, key, buckets, hotKeys(skewed, key, hotKeyMinCount))

  /** Skew-aware inner join with an explicit (small) hot-key relation —
    * use when the hot keys are already known (e.g. from yesterday's run)
    * to skip the detection pass. */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      buckets: Int,
      hot: DataFrame): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltCol = "__graft_salt"
    val hotK = broadcast(hot.select(col(key)).distinct())
    val skewedHot = skewed.join(hotK, Seq(key), "left_semi")
    val skewedCold = skewed.join(hotK, Seq(key), "left_anti")
    val otherHot = other.join(hotK, Seq(key), "left_semi")
    val otherCold = other.join(hotK, Seq(key), "left_anti")
    // Deterministic spread of each hot key's rows across buckets: hash
    // all columns (row identity), not the key (which is constant per key
    // — hashing it would put the whole hot key in one bucket again).
    val saltedLeft = skewedHot.withColumn(saltCol,
      pmod(hash(skewedHot.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicatedRight = otherHot.withColumn(saltCol,
      explode(typedLit((0 until buckets).toArray)))
    val hotJoined = saltedLeft
      .join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft(saltCol) === replicatedRight(saltCol))
      .drop(saltCol)
    val coldJoined = skewedCold.join(otherCold, skewedCold(key) === otherCold(key))
    hotJoined.union(coldJoined)
  }
}
