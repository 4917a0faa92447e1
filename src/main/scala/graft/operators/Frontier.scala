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
}
