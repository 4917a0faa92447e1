package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Source/sink format coverage: write a relation through Spark's
 * built-in columnar (ORC) and row/interchange (CSV, JSON-lines)
 * connectors and read it back with an EXPLICIT schema — the roundtrip
 * summary proves bytes-in ≡ bytes-out per format. Parquet is the
 * repo's native store (every other query reads it); this operator
 * closes the remaining built-in format surface.
 *
 * Scale notes, per format:
 *  - ORC: columnar, splittable, predicate/pruning-capable — the
 *    interchange peer of Parquet; fine at 100 TB.
 *  - JSON lines: splittable (newline-framed), schema-on-read with the
 *    explicit schema (never inference — a 100 TB inference pass is a
 *    full extra scan); the standard landing format for crawl/API data.
 *  - CSV: header + quote/escape symmetric on both sides; kept
 *    single-line here (multiLine=true makes files unsplittable — a
 *    real 100 TB pipeline treats multiline CSV as a decode job, not a
 *    table). Text columns with embedded newlines belong in Parquet/
 *    ORC/JSON, not CSV.
 */
object FormatSinks {

  /** Write `df` as each of `formats` under `dir`, read each back with
    * the source schema, and emit one summary row per format (count,
    * distinct-text count, char mass, id checksum) — equal rows across
    * formats ⇔ lossless roundtrip. */
  def roundtripSummary(df: DataFrame, formats: Seq[String], dir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    formats.map { fmt =>
      val path = s"$dir/$fmt"
      val w = df.write.mode(SaveMode.Overwrite).format(fmt)
      // CSV: writer-side whitespace trimming is ON by default — a silent
      // lossy surprise; disable both for a faithful roundtrip.
      (if (fmt == "csv") w.option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
       else w).save(path)
      val r = spark.read.format(fmt).schema(schema)
      val back = (if (fmt == "csv") r.option("header", "true").option("escape", "\"")
                  else r).load(path)
      back.agg(
        count(lit(1)).as("n_docs"),
        count_distinct(md5(col(textCol))).as("n_distinct_texts"),
        sum(length(col(textCol))).cast("long").as("total_chars"),
        sum(col(idCol)).cast("long").as("id_sum"))
        .select(lit(fmt).as("format"), col("n_docs"),
          col("n_distinct_texts"), col("total_chars"), col("id_sum"))
    }.reduce(_ unionAll _).orderBy("format")
  }
}
