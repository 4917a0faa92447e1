package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Crawler-trap detection — the frontier's self-defense: calendars,
 * session ids, and faceted navigation generate INFINITE URL spaces
 * (every date has a page, every visitor a sid), and a crawler that
 * can't see the pattern spends its whole fetch budget inside one
 * site. The standard signal is URL-space amplification: collapse each
 * URL to its TEMPLATE (digit runs → `N`, long hex runs → `H`, query
 * VALUES dropped — only the sorted key set kept) and compare how many
 * distinct URLs map to how many distinct templates per host. A host
 * where 50 000 URLs collapse to 3 templates is generating them; a
 * real content site has roughly as many templates as sections.
 *
 * Everything is exact: templating is a per-URL pure function
 * (scan-local), the card is one hash aggregate of two distinct-counts
 * and an integral amplification ratio — replayable by a SQL oracle
 * and safe to feed back into [[Frontier]] as a per-host budget cap.
 */
object CrawlTraps {

  private val HexRun = "(?i)(?<![0-9a-z])[0-9a-f]{8,}(?![0-9a-z])".r
  private val DigitRun = "[0-9]+".r

  /** The URL's template: host + path with digit runs → `N` and
    * standalone hex runs of ≥ 8 → `H`, plus the SORTED query keys
    * (values dropped — they are what traps vary). Unparseable input
    * templates to itself, so garbage can't crash a census. */
  def template(url: String): String =
    UrlOps.parse(url) match {
      case Some(u) => templateOf(u)
      case None => if (url == null) "" else url
    }

  /** The template from an ALREADY-parsed URL — so pipelines that need
    * host and template parse each URL once, not twice. */
  def templateOf(u: UrlOps.ParsedUrl): String = {
    val path = DigitRun.replaceAllIn(
      HexRun.replaceAllIn(u.path, "H"), "N")
    val keys = u.query.split("&").iterator
      .map(_.takeWhile(_ != '=')).filter(_.nonEmpty).toSeq.sorted
    u.host + path + (if (keys.isEmpty) "" else "?" + keys.mkString(","))
  }

  /** Per-host amplification card over a (urlCol) relation:
    * (host, n_urls, n_templates, amplification, is_trap). */
  def trapScores(
      urls: DataFrame, urlCol: String, minAmplification: Long = 8L): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(col(urlCol).cast("string")).as[String]
      .map { u =>
        UrlOps.parse(u) match { // parse ONCE: host and template share it
          case Some(p) => (p.host, u, templateOf(p))
          case None => ("", u, if (u == null) "" else u)
        }
      }
      .toDF("host", "url", "tmpl")
      .filter(col("host") =!= "")
      .groupBy("host")
      .agg(countDistinct(col("url")).as("n_urls"),
        countDistinct(col("tmpl")).as("n_templates"))
      .withColumn("amplification", expr("n_urls div n_templates"))
      .withColumn("is_trap", col("amplification") >= minAmplification)
  }
}
