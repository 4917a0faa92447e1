package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * JSONL ingest triage — the first pass over a JSON-lines dump (the de
 * facto interchange format of LLM training corpora) BEFORE committing
 * to a schema: which top-level fields exist, what type each carries
 * and how consistently, and how many lines are malformed. Runs on the
 * raw line relation (`spark.read.text` at ingest), so a schema-drift
 * source (a field flipping string→number mid-dump, a partial write
 * truncating lines) is caught by counting, not by a parser exception
 * 40 minutes into a full `spark.read.json`.
 *
 * Built on the codegen `json_field_types` kernel
 * ([[graft.functions.JsonKernels.jsonFieldTypes]]): one linear scan
 * per line inside WholeStageCodegen — no per-row parsed tree, no
 * sampling-based schema inference pass over the corpus. Census =
 * kernel + one explode + one grouped count; at 100 TB that is
 * scan-local work plus a single aggregate exchange on (key, vtype) —
 * a key space of tens, not a data-sized shuffle.
 */
object JsonLines {

  /**
   * Field census over a JSONL line relation: one row per
   * (key, vtype) with its line count, plus a `__malformed__` row
   * counting lines that are not exactly one valid JSON object.
   *
   * @param lines   relation of raw lines
   * @param lineCol line column name
   * @return (key, vtype, n) ordered by (key, vtype); duplicate keys
   *         inside one object count once per occurrence.
   */
  def fieldCensus(lines: DataFrame, lineCol: String): DataFrame = {
    GraftFunctions.register(lines.sparkSession)
    val typed = lines.select(
      GraftFunctions.jsonFieldTypes(col(lineCol)).as("__f"))
    val fields = typed.filter(col("__f").isNotNull)
      .select(explode(col("__f")).as("kv"))
      .select(col("kv.key").as("key"), col("kv.vtype").as("vtype"))
      .groupBy("key", "vtype").agg(count(lit(1)).as("n"))
    val bad = typed.filter(col("__f").isNull)
      .agg(count(lit(1)).as("n"))
      .select(lit("__malformed__").as("key"), lit("invalid").as("vtype"),
        col("n"))
      .filter(col("n") > 0)
    fields.unionByName(bad).orderBy("key", "vtype")
  }

  /**
   * Per-field presence/consistency card over the same census: for
   * each key, the number of lines carrying it, its dominant type, and
   * whether it is MONOMORPHIC (one type across the dump) — the
   * decision table for declaring the ingest schema.
   *
   * @return (key, n_lines, n_types, top_vtype, monomorphic) ordered
   *         by key; dominant-type ties break to the lexicographically
   *         smaller type name.
   */
  def schemaCard(lines: DataFrame, lineCol: String): DataFrame =
    fieldCensus(lines, lineCol)
      .filter(col("key") =!= "__malformed__")
      .groupBy("key")
      .agg(
        sum("n").as("n_lines"),
        count(lit(1)).as("n_types"),
        min(struct((-col("n")).as("__neg"), col("vtype").as("__t")))
          .getField("__t").as("top_vtype"))
      .withColumn("monomorphic", col("n_types") === 1L)
      .orderBy("key")
}
