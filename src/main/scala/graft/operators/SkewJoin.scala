package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit key-salting for pathologically skewed equality joins.
 *
 * AQE's skew-join handles moderate skew by splitting oversized shuffle
 * partitions, but a single join KEY hotter than an entire executor (a
 * viral duplicate fingerprint, an LSH bucket of boilerplate documents)
 * still lands on one task. Salting splits each skewed key into
 * `buckets` sub-keys and replicates the other side once per bucket —
 * one hot reducer becomes `buckets` even ones, at the cost of
 * `buckets`× the other side's shuffle volume (so salt the side that is
 * small or pre-filtered).
 *
 * The salt assignment on the skewed side is arbitrary by construction —
 * any row may land in any bucket — so the inner-join result is
 * identical to the unsalted join.
 */
object SkewJoin {

  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltCol = "__graft_salt"
    // Deterministic spread of each key's rows across buckets: hash all
    // columns (row identity), not the key (which is constant per key —
    // hashing it would put the whole hot key in one bucket again).
    val saltedLeft = skewed.withColumn(saltCol,
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicatedRight = other.withColumn(saltCol,
      explode(typedLit((0 until buckets).toArray)))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft(saltCol) === replicatedRight(saltCol))
      .drop(saltCol)
  }
}
