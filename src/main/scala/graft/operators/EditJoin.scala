package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity self-join — the spell-correction / entity-
 * resolution primitive: all pairs of rows whose strings are within
 * Levenshtein distance τ, WITHOUT the quadratic all-pairs scan.
 *
 * Blocking is the deletion neighborhood (the spell-checker classic,
 * public in e.g. SymSpell and the FastSS literature): each string's
 * signature set is itself plus every single-character-deletion
 * variant. Two strings with ed ≤ 1 always share a signature —
 * substitution at position i: both sides delete position i;
 * insertion/deletion: deleting the inserted character from the longer
 * side yields the shorter side's identity signature — so the blocking
 * is COMPLETE for τ = 1 (enforced), and every emitted pair is then
 * verified with the exact bit-parallel
 * [[graft.functions.TextHashKernels.editDistance]] kernel, so there
 * are no false positives either: output ≡ brute force, which is the
 * driver row's oracle (a literal quadratic DuckDB self-join).
 *
 * 100 TB shape: signatures are hashed to 64 bits INSIDE the scan by
 * the codegen kernel
 * [[graft.functions.TextHashKernels.deletionNeighborhoodHashes]]
 * (no variant string is ever materialized, no CodegenFallback
 * higher-order functions), so the one blocking shuffle carries
 * (id, sig_hash) pairs — |s|+1 slim 16-byte rows per input row — and
 * the join is bucket-equality on the hash. Candidate pairs are
 * deduplicated BEFORE the strings are joined back on, so the string
 * payload moves only for the bounded verified-candidate set and each
 * pair pays the DP once. Bucket sizes are bounded by the neighborhood
 * geometry (only strings within ed ≤ 2 of each other can share a
 * deletion signature), not by corpus size — no caps needed for
 * correctness.
 */
object EditJoin {

  /**
   * All pairs (id_a < id_b) with Levenshtein(str_a, str_b) ≤ tau,
   * code-point units. Output: (id_a, id_b, dist).
   */
  def editSelfJoin(
      df: DataFrame, idCol: String, strCol: String,
      tau: Int = 1): DataFrame = {
    require(tau == 1,
      s"deletion-neighborhood blocking is complete for tau = 1 only, got $tau")
    GraftFunctions.register(df.sparkSession)
    val base = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
    // kernel already dedupes equal-char-run variants and includes the
    // identity signature; an empty string yields just the identity
    val sigged = base.select(col("__id"),
      explode(GraftFunctions.deletionNeighborhoodHashes(col("__s")))
        .as("__h"))
    val a = sigged.select(col("__id").as("id_a"), col("__h"))
    val b = sigged.select(col("__id").as("id_b"), col("__h"))
    val cand = a.join(b, Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair can share several signatures; verify once
    cand
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")),
        Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.editDistance(col("__sa"), col("__sb"), "codepoint")
          .as("dist"))
      .filter(col("dist") <= tau)
  }
}
