package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Bucketed storage for co-located joins and aggregations.
 *
 * Writing both sides of a repeated equi-join bucketed (and sorted) by
 * the join key makes every subsequent join/aggregation on that key
 * SHUFFLE-FREE: Spark matches bucket files pairwise and sort-merge
 * joins them in place. At 100 TB this converts the dominant cost of a
 * recurring pipeline (the shuffle of the fact table, every run) into a
 * one-time layout decision at write time.
 *
 * When to bucket: the key is joined/grouped repeatedly (embeddings ⋈
 * documents on id, events by user) AND the table is rewritten rarely.
 * Bucket count ≈ target parallelism; both sides must agree on it.
 * One-off joins are cheaper left to AQE.
 */
object BucketedStore {

  /** Write `df` as a bucketed+sorted catalog table (bucket metadata
    * lives in the catalog, so `saveAsTable` is required — a plain path
    * write cannot record bucketing). */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
