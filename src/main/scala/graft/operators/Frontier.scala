package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Frontier scheduling — the last stage of the crawl control plane:
 * after discovery ([[HtmlExtract]] links), canonicalization/dedup
 * ([[UrlOps]]), policy ([[RobotsTxt]] allow + Crawl-delay), seeding
 * ([[Sitemap]]) and ranking ([[LinkRank]]), something has to decide
 * WHICH URLs are fetched next cycle and WHEN — politely, one request
 * per host per crawl-delay.
 *
 * Per host: keep the top-k candidates by (priority DESC, url_id ASC)
 * and assign slot s its fetch offset s·delay_ms. Per-host
 * sequentialization is INHERENT to politeness (a host's fetch schedule
 * is serial by definition), so grouping by host is the natural — and
 * only correct — partitioning; the scale question is solely how much
 * data reaches that exchange.
 *
 * Scale design (100 TB frontier, billions of candidates, viral hosts
 * with millions of discovered URLs): the per-host queue is bounded by
 * the `topk_by_score` TypedImperativeAggregate — a k-slot buffer per
 * host rides the shuffle (map-side partial, at most k pairs per host
 * per task), so a host with 10M candidates contributes k rows to the
 * exchange, not 10M. The window-function alternative
 * (`row_number() OVER (PARTITION BY host ...)`) would shuffle and sort
 * EVERY candidate of every host — the viral-host hot partition this
 * repo's conventions reject. No global sort: output order is only for
 * display; the fetch fleet consumes per-host groups as emitted.
 *
 * Priorities are integral (rank buckets from [[LinkRank]], sitemap
 * priority decims×10, …) so scheduling is exactly reproducible; the
 * id tie-break is the aggregate's contract. `delay_ms` is a per-host
 * constant (from [[RobotsTxt]] Crawl-delay, default if absent) and
 * rides the group key.
 */
object Frontier {

  /**
   * @param candidates columns (host: string, url_id: long,
   *                   priority: long, delay_ms: long) — delay_ms
   *                   constant per host
   * @param k          per-host queue depth for this fetch cycle
   * @return (host, slot, url_id, priority, fetch_at_ms): the top-k
   *         per host, slot 0-based in priority order, fetch_at_ms =
   *         slot · delay_ms.
   */
  def schedule(candidates: DataFrame, k: Int): DataFrame = {
    candidates
      .groupBy("host", "delay_ms")
      .agg(GraftFunctions.topKByScore(col("priority").cast("double"), col("url_id"), k)
        .as("top"))
      .select(col("host"), col("delay_ms"),
        posexplode(col("top")).as(Seq("slot", "pair")))
      .select(
        col("host"),
        col("slot").cast("long").as("slot"),
        col("pair.id").as("url_id"),
        col("pair.score").cast("long").as("priority"),
        (col("slot").cast("long") * col("delay_ms")).as("fetch_at_ms"))
  }

  /**
   * Change-rate recrawl scheduling — the freshness half of frontier
   * policy ([[schedule]] is the politeness half): pages that keep
   * changing are refetched soon, pages that have been stable back off
   * EXPONENTIALLY (the standard crawler freshness heuristic, binary
   * backoff capped at `maxIntervalS`). The input is the fetch
   * history a crawl already has — (page, fetch_idx, content
   * fingerprint) — so the schedule derives from observations, not
   * configuration.
   *
   * stable_run = fetches since the last OBSERVED change (0 when the
   * newest fetch changed; n_fetches-1 when nothing ever changed after
   * fetch 0); interval = min(baseIntervalS << stable_run,
   * maxIntervalS); next_fetch_s = last_fetch_s + interval. All
   * integral — the schedule is reproducible and SQL-replayable.
   *
   * Shape: one partitioned window (lag of the fingerprint within a
   * page's bounded history) + one hash aggregate per page. Histories
   * are short (a crawler keeps the last dozen observations), so the
   * window partition is bounded by policy, not data.
   */
  def recrawlSchedule(
      fetches: DataFrame, pageCol: String, idxCol: String, fpCol: String,
      lastFetchSCol: String,
      baseIntervalS: Long = 3600L,
      maxIntervalS: Long = 7L * 86400L): DataFrame = {
    require(baseIntervalS > 0 && maxIntervalS >= baseIntervalS,
      "need 0 < baseIntervalS <= maxIntervalS")
    require(baseIntervalS <= (Long.MaxValue >> 25),
      s"baseIntervalS too large to shift safely: $baseIntervalS")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pageCol).orderBy(idxCol)
    val marked = fetches
      .withColumn("__changed",
        lag(col(fpCol), 1).over(w).isNotNull &&
          lag(col(fpCol), 1).over(w) =!= col(fpCol))
    marked.groupBy(col(pageCol).as("page"))
      .agg(count(lit(1)).as("n_fetches"),
        max(when(col("__changed"), col(idxCol)).otherwise(lit(0L)))
          .cast("long").as("last_change_idx"),
        max(col(idxCol)).cast("long").as("last_idx"),
        max(col(lastFetchSCol)).cast("long").as("last_fetch_s"))
      .withColumn("stable_run", col("last_idx") - col("last_change_idx"))
      // shift cap 24 keeps base<<run far under Long overflow while
      // any realistic maxIntervalS is reached long before it
      .withColumn("interval_s",
        least(
          expr(s"${baseIntervalS}L * shiftleft(1L, " +
            "cast(least(stable_run, 24L) as int))"),
          lit(maxIntervalS)))
      .withColumn("next_fetch_s", col("last_fetch_s") + col("interval_s"))
      .select("page", "n_fetches", "last_change_idx", "stable_run",
        "interval_s", "next_fetch_s")
  }
}
