package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Line-level boilerplate removal — the CCNet / RefinedWeb corpus pass
 * that strips navigation bars, cookie banners and copyright footers by
 * CORPUS frequency: a line that recurs across many documents of the
 * same group (domain / source) is template chrome, not content, and is
 * deleted from every document; lines unique to a few documents are
 * prose and survive. This is the first text transform after HTML
 * extraction in every large crawl pipeline (C4 dropped repeated
 * three-sentence spans; CCNet dedups at paragraph level across shards).
 *
 * Beyond-reference scope (the reference has no text functions,
 * SURVEY.md §2.2).
 *
 * Scale shape: one `posexplode` over the line split; the boilerplate
 * decision is a (group, line) hash aggregate of DISTINCT doc counts
 * (partial map-side); the verdict relation is slim — two strings per
 * boilerplate line, a tiny fraction of the corpus — so the join back
 * onto the exploded lines broadcasts for real-world template counts
 * (AQE decides). Reassembly is one per-document aggregate; nothing
 * ever sorts more than a single document's lines.
 */
object Boilerplate {

  /** Exploded numbered lines: (doc_id, grp, pos, line). */
  def lines(pages: DataFrame, idCol: String, groupCol: String,
      textCol: String): DataFrame =
    pages.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  /** Boilerplate verdicts: lines occurring in ≥ `minDocs` DISTINCT
    * documents of the same group. (grp, line) — slim by construction. */
  def boilerplateLines(pages: DataFrame, idCol: String, groupCol: String,
      textCol: String, minDocs: Int): DataFrame =
    lines(pages, idCol, groupCol, textCol)
      .groupBy(col("grp"), col("line"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /**
   * Per-document cleanup summary: total lines, removed lines, and the
   * fingerprint of the document with boilerplate lines deleted (order
   * preserved). Fingerprint rather than full text keeps the result
   * relation narrow; callers wanting the text drop the `md5`.
   */
  def removeBoilerplate(pages: DataFrame, idCol: String, groupCol: String,
      textCol: String, minDocs: Int): DataFrame = {
    val ls = lines(pages, idCol, groupCol, textCol)
    val boiler = boilerplateLines(pages, idCol, groupCol, textCol, minDocs)
      .select(col("grp"), col("line"), lit(true).as("is_boiler"))
    ls.join(boiler, Seq("grp", "line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        coalesce(sum(when(col("is_boiler"), 1L)), lit(0L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n")).as("clean_fp"))
  }
}
