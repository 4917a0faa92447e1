package graft.operators

import graft.functions.{BloomKernels, GraftFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-pruned equi-join: build a Bloom filter over the small side's
 * join keys, pre-filter the fact side with a codegen'd probe, then run
 * the exact join. False positives survive the probe but die in the
 * join, so the result is IDENTICAL to the plain join — the filter only
 * changes how much of the fact table moves.
 *
 * Why this matters at 100 TB: a fact⋈dim join where the dim side is
 * selective (filtered orders, a sampled id list) still shuffles the
 * ENTIRE fact table without a runtime filter — the join can't drop a
 * fact row until it meets the build side post-shuffle. The Bloom probe
 * drops non-matching fact rows AT THE SCAN (inside WholeStageCodegen,
 * before the exchange), cutting shuffle volume to roughly the matching
 * fraction plus fpp. This is the engine-owned version of the runtime
 * row filters AQE injects when statistics allow; owning it makes the
 * behavior deterministic and configurable per pipeline.
 *
 * The filter travels driver→executors as a BROADCAST variable: the
 * plan (and every stage's task binary) carries only the ~100-byte
 * broadcast handle, and executors fetch the numBits/8-byte blob once
 * via the broadcast manager. (The earlier literal form re-serialized
 * the filter into each stage's task closure — Spark's "Broadcasting
 * large task binary" warning; at 1000 executors × several stages that
 * is filter-size × stages of driver egress per query, for no reason.)
 * Driver-side footprint stays bounded by the knob, never by the data.
 * Null fact keys may pass the probe (xxhash64 hashes null to its
 * seed) and are then dropped by the exact equi-join, exactly as they
 * would be without pruning.
 */
object BloomJoin {

  /**
   * The fact rows that MAY join (exact superset of the matching rows):
   * `fact` filtered by a Bloom filter built over `dim`'s `dimKey`.
   * Exposed separately so pipelines can prune once and reuse.
   */
  def pruneFact(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val numBits = BloomKernels.optimalNumBits(expectedItems, fpp)
    val numHashes = BloomKernels.optimalNumHashes(expectedItems, numBits)
    // One small aggregate job over the dim side: partial filters are
    // built map-side and OR-merged; the driver receives numBits/8 bytes.
    val filter = dim
      .agg(GraftFunctions.bloomBuild(xxhash64(col(dimKey)), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact.filter(GraftFunctions.bloomProbeBroadcast(
      BloomJoin.tagFor(fact.sparkSession, filter),
      xxhash64(col(factKey))))
  }

  // Identical filters (the common case: the same pruned join re-run
  // per action, bench rep, or pipeline stage) reuse ONE broadcast +
  // registry tag instead of minting a never-destroyed pair per call.
  // Keyed by content hash, equality-verified on hit. Eviction is
  // wholesale AND RECLAIMS: each dropped entry's tag is deregistered
  // and its Broadcast destroyed, so a churny workload (>64 distinct
  // dim sides) holds at most one generation of blobs on driver and
  // executors — the r9 ADVICE leak. The cost: a plan built before an
  // eviction and executed after it loses its broadcast (rebuild it
  // through the operator API); live plans within one generation are
  // unaffected.
  private val tagCache = new java.util.concurrent.ConcurrentHashMap[
    Int, (Array[Byte], String)]()

  private def tagFor(
      spark: org.apache.spark.sql.SparkSession,
      filter: Array[Byte]): String = {
    val key = java.util.Arrays.hashCode(filter)
    val hit = tagCache.get(key)
    if (hit != null && java.util.Arrays.equals(hit._1, filter)) hit._2
    else {
      val bc = spark.sparkContext.broadcast(filter)
      val tag = graft.functions.BloomBroadcastRegistry.register(bc)
      if (tagCache.size > 64) evictAll()
      tagCache.put(key, (filter, tag))
      tag
    }
  }

  /** Destroy every cached broadcast and drop its registry tag. Also
    * the test/app shutdown hook for a fully clean session. */
  private[graft] def evictAll(): Unit = {
    val it = tagCache.values().iterator()
    while (it.hasNext) {
      val tag = it.next()._2
      try {
        val bc = graft.functions.BloomBroadcastRegistry.lookup(tag)
        graft.functions.BloomBroadcastRegistry.deregister(tag)
        bc.destroy()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    tagCache.clear()
  }

  /**
   * Bloom-pruned inner equi-join on `factKey = dimKey`; result is
   * bit-identical to `fact.join(dim, fact(factKey) === dim(dimKey))`.
   */
  def prunedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = pruneFact(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
