package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — a standard compliance pass in LLM
 * training-data pipelines (beyond-reference scope; the reference has no
 * string processing at all, SURVEY.md §2.2). Detects emails, North-
 * American-style phone fragments, and IPv4 addresses with fixed regex
 * patterns and replaces them with typed placeholder tokens.
 *
 * 100 TB shape: one codegen'd projection per row (`regexp_extract_all` +
 * `regexp_replace` are Spark built-ins) — no shuffle, no UDF, no state;
 * the cheapest possible full-corpus pass, like [[TextAnalysis.qualityScore]].
 *
 * The patterns deliberately avoid constructs whose semantics differ
 * between regex engines (no lookaround, no backreferences, no lazy
 * quantifiers), so the same pattern strings run identically on Java
 * regex (Spark) and RE2-style engines — which is what makes the
 * cross-engine oracle exact.
 */
object Pii {

  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction order is fixed (email → IPv4 → phone) and the replacement
    * tokens contain no digits or '@', so later passes can never match
    * inside an earlier replacement. */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII counts (on the raw text) plus the redacted text's
    * length and MD5 fingerprint — enough for both an audit rollup and a
    * verify-the-redaction downstream check without materializing two
    * copies of the corpus. */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = redactText(t)
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ips"),
      length(redacted).cast("long").as("n_chars_redacted"),
      md5(redacted.cast("binary")).as("redacted_fp"))
  }

  /** The redacted corpus itself (id, redacted text) — the pipeline
    * composition surface ([[scrub]] is the audit surface). */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), redactText(col(textCol)).as(textCol))

  val CardPattern = "[0-9]{16}"

  /** Luhn mod-10 check over a digit-string column — TRUE iff the ISO
    * 7812 checksum holds. Pure array-HOF arithmetic (no UDF): from the
    * rightmost digit, every second digit doubles (minus 9 past 9) and
    * the total must divide by 10. Candidates are rare per corpus, so
    * the interpreted HOF is off the hot path by construction. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val total = aggregate(
      transform(sequence(lit(1), length(digits)), i => {
        val d = ascii(rev.substr(i, lit(1))) - lit(48)
        when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, v) => acc + v)
    total % 10 === 0
  }

  /** Card-number candidate audit: extract 16-digit runs and validate
    * each with [[luhnValid]] — the checksum pass that separates real
    * card numbers from order ids, cutting the regex detector's false
    * positives before anything is redacted. One scan-local projection
    * + explode; output is (id, candidate, luhn_valid) per candidate. */
  def luhnAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(CardPattern), lit(0)))
          .as("candidate"))
      .withColumn("luhn_valid", luhnValid(col("candidate")))

  /** IBAN candidate shape (ISO 13616): 2 uppercase country letters,
    * 2 check digits, 11–30 alphanumeric BBAN chars. Engine-portable
    * (no lookaround), same contract as the other patterns. */
  val IbanPattern = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  /** ISO 7064 mod-97-10 IBAN checksum (ISO 13616): move the first 4
    * chars to the end, expand letters to two digits (A=10..Z=35), and
    * the resulting number mod 97 must equal 1. The big number never
    * materializes — the fold keeps `acc < 97` and multiplies by 10
    * per digit / 100 per letter, all int arithmetic in one
    * `aggregate` HOF (no UDF; same discipline as [[luhnValid]]).
    * Letters encode as `65536 + value` so one int carries both the
    * multiplier flag and the value through the fold. Country-specific
    * BBAN lengths are NOT checked — this is the checksum gate, which
    * alone removes ~99% of random digit-run false positives. */
  def ibanValid(iban: Column): Column = {
    val r = concat(substring(iban, 5, 30), substring(iban, 1, 4))
    val rem = aggregate(
      transform(sequence(lit(1), length(r)), i => {
        val c = ascii(r.substr(i, lit(1)))
        when(c >= 65, c - 55 + 65536).otherwise(c - 48)
      }),
      lit(0),
      (acc, x) =>
        (acc * when(x >= 65536, 100).otherwise(10) + x % 65536) % 97)
    rem === 1
  }

  /** IBAN candidate audit — extraction + checksum, the account-number
    * analogue of [[luhnAudit]]: (id, candidate, iban_valid) per
    * candidate, scan-local. */
  def ibanAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(IbanPattern), lit(0)))
          .as("candidate"))
      .withColumn("iban_valid", ibanValid(col("candidate")))

  /**
   * Redaction-span union: several detectors emit half-open character
   * spans `[start, end)` per document; before surgery they must merge
   * (overlapping `<EMAIL>`/`<PHONE>` cuts corrupt each other's
   * offsets). Classic sweep: within each document order by (start,
   * end); a span OPENS a new merged group iff its start exceeds the
   * running max end of everything before it (touching spans merge —
   * adjacent redactions become one cut). Output: one row per merged
   * span (id, start, end).
   *
   * Shape: windows PARTITIONED per document (span counts per doc are
   * detector-bounded); no cross-document anything.
   */
  def mergeSpans(
      spans: DataFrame, idCol: String, startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(startCol, endCol)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = spans
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum("__new").over(w))
    grouped.groupBy(col(idCol), col("__grp"))
      .agg(min(startCol).as("start"), max(endCol).as("end"))
      .drop("__grp")
  }

  /** Per-document span-merge card: raw span count, merged count, and
    * covered character total after the union. */
  def spanMergeCard(
      spans: DataFrame, idCol: String, startCol: String,
      endCol: String): DataFrame =
    mergeSpans(spans, idCol, startCol, endCol)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_merged"),
        sum(col("end") - col("start")).as("covered_chars"))
      .join(spans.groupBy(idCol).agg(count(lit(1)).as("n_raw")), idCol)
      .select(col(idCol), col("n_raw").cast("long").as("n_raw"),
        col("n_merged").cast("long").as("n_merged"),
        col("covered_chars").cast("long").as("covered_chars"))
}
