package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended execution configs.
 *
 * Scale guidance (the knobs that matter at 100 TB / 1000 executors):
 *  - AQE on (default in Spark 4, pinned here): runtime coalescing of
 *    shuffle partitions, skew-join splitting for hot dedup fingerprints
 *    or LSH buckets, and dynamic join-strategy demotion.
 *  - `spark.sql.shuffle.partitions`: start at 2–3× total executor
 *    cores; AQE coalesces down, it cannot split a too-coarse map side.
 *  - `spark.sql.files.maxPartitionBytes` (default 128m): with 64-dim
 *    float embeddings ≈ 270 B/row, a scan task holds ~500k rows —
 *    comfortable; raise only for wide multimodal payload columns.
 *  - Event-time columns normalize through `EventPipeline.normalizeTs`:
 *    Parquet TIMESTAMP(NANOS) reads as epoch-nanos longs
 *    (`nanosAsLong`), TIMESTAMP(isAdjustedToUTC=false) reads as
 *    TIMESTAMP_NTZ — both convert to TimestampType under the pinned
 *    UTC session zone, so operators see ONE type whichever writer
 *    produced the table.
 */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed catalog tables (BucketedStore) land in a per-session
      // temp warehouse, not the working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
}
