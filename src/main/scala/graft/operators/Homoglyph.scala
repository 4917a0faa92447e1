package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Homoglyph skeletons and spoof-domain detection (the UTS #39
 * confusables idea, pinned subset) — the security leg of the crawl
 * plane: `fаlcon.example` with a CYRILLIC а and `fa1con.example`
 * with a digit one both render like `falcon.example`, and a crawler
 * that treats them as distinct sources lets phishing mirrors into the
 * corpus under a trusted domain's reputation. The defense is the
 * skeleton transform: map confusable characters to their ASCII
 * lookalike and flag any domain whose skeleton equals a DIFFERENT
 * existing domain.
 *
 * The mapping is a deliberately pinned, documented subset of the
 * Unicode confusables data: lowercase Cyrillic and Greek letters that
 * are visually identical to Latin in common fonts, plus the two
 * classic digit substitutions. (The full confusables.txt drops into
 * [[Table]] the same way the full public-suffix list dropped into
 * PublicSuffix.Rules.) Hosts are expected lowercase — run after
 * [[UrlOps]] normalization.
 *
 * Shape at scale: skeleton is a scan-local per-char map; detection is
 * ONE equality self-join on the skeleton key over the (distinct,
 * metadata-sized) domain relation.
 */
object Homoglyph {

  /** confusable char → ASCII skeleton. */
  val Table: Map[Char, Char] = Map(
    // Cyrillic lowercase lookalikes (U+04xx)
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
    'х' -> 'x', 'у' -> 'y', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
    'ԛ' -> 'q', 'ԝ' -> 'w',
    // Greek lowercase lookalikes (U+03xx)
    'ο' -> 'o', 'α' -> 'a', 'ι' -> 'i', 'κ' -> 'k', 'ρ' -> 'p',
    'υ' -> 'u', 'ν' -> 'v',
    // classic digit substitutions
    '0' -> 'o', '1' -> 'l')

  def skeleton(host: String): String =
    if (host == null) "" else host.map(c => Table.getOrElse(c, c))

  /**
   * Spoof card over a domain relation: every DISTINCT domain with its
   * skeleton and `is_spoof` — true iff the skeleton differs from the
   * domain AND matches another existing domain (the impersonation
   * target). The join ships (domain, skeleton) pairs only.
   */
  def spoofCandidates(domains: DataFrame, domainCol: String): DataFrame = {
    val spark = domains.sparkSession
    import spark.implicits._
    val d = domains.select(col(domainCol).cast("string")).as[String]
      .map(h => (h, skeleton(h)))
      .toDF("domain", "skeleton")
      .distinct()
    val targets = d.select(col("domain").as("__target")).distinct()
    d.join(targets,
        col("skeleton") === col("__target") &&
          col("domain") =!= col("__target"), "left")
      .select(col("domain"), col("skeleton"),
        col("__target").isNotNull.as("is_spoof"))
  }
}
