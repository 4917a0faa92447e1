package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive fan-out for kernel-bound plans.
 *
 * The bench fixtures are single-row-group parquet files, so a scan —
 * and everything narrow above it (projection kernels: chrF gram
 * counting, decimal sums, per-pair BLEU) — runs as ONE task no matter
 * how many cores the session has. At cluster scale the same tables
 * arrive as thousands of row groups and the scan parallelizes by
 * itself; the under-parallelism is a property of the INPUT LAYOUT,
 * not of the query, so the fix must be adaptive, not a constant.
 *
 * [[widen]] repartitions to the session's default parallelism ONLY
 * when the plan's current partition count is below it — a no-op
 * whenever the input already parallelizes, so it can never add a
 * shuffle at scale (guide §2: partitioning decisions must derive from
 * the data, not from the local core count). The shuffle it does add
 * moves exactly the kernel's input columns once.
 *
 * Only for partitioning-insensitive consumers: exact integer/decimal
 * aggregates, per-row projections, equality-keyed regroups. Callers
 * with float accumulation order sensitivity must not widen.
 */
object Fanout {
  def widen(df: DataFrame): DataFrame = {
    val parts = df.rdd.getNumPartitions
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (parts >= cores) df else df.repartition(cores)
  }
}
