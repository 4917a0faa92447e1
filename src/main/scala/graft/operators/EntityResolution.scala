package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Entity resolution (record linkage) over string-keyed records —
 * beyond-reference scope, the standard curation step for supplier /
 * author / site-name tables feeding a training corpus: the same
 * real-world entity appears under slightly different spellings and
 * must be linked WITHOUT an O(n²) all-pairs string comparison.
 *
 * The classic scalable shape (Fellegi–Sunter blocking, the same
 * family as the MinHash band trick in [[Dedup]]):
 *
 *  1. **multi-pass blocking** — each record emits a handful of cheap
 *     keys (here: first-k chars, last-k chars). Records sharing ANY
 *     key become candidates. One narrow (key, id, name) relation,
 *     one equality shuffle — never an inequality join. A single-char
 *     edit at position p preserves the prefix key (p > k) or the
 *     suffix key (p ≤ len−k), so recall is 1 for names longer than
 *     2k — the pigeonhole argument Manku's SimHash blocks use.
 *  2. **in-block verify** — `levenshtein` (codegen built-in) only on
 *     candidate pairs; pairs sharing several keys are deduplicated by
 *     (a, b) BEFORE the edit-distance runs.
 *  3. **cluster** — matched pairs feed [[ConnectedComponents]]
 *     (pointer doubling); each record's entity id = min record id in
 *     its component.
 *
 * At 100 TB the block keys are short fixed strings, the pair relation
 * carries ids + the two names only, and `maxBucket` (same knob as
 * [[SimilarityJoin]]) guards against viral blocks ("inc", "llc"
 * prefixes): a block larger than the cap is dropped — candidate loss
 * is logged by the caller's recall probe, never an executor OOM.
 */
object EntityResolution {

  /** (key, id, name) blocking relation: prefix-k and suffix-k passes.
    * Names shorter than k emit the whole name for both passes (still
    * valid keys, still equality-joinable). */
  private def blockingKeys(
      df: DataFrame, idCol: String, nameCol: String, k: Int): DataFrame = {
    val pre = df.select(
      concat(lit("p:"), substring(col(nameCol), 1, k)).as("blk"),
      col(idCol).as("id"), col(nameCol).as("name"))
    val suf = df.select(
      concat(lit("s:"), substring(col(nameCol), -k, k)).as("blk"),
      col(idCol).as("id"), col(nameCol).as("name"))
    pre.unionByName(suf)
  }

  /**
   * Candidate pairs within `maxDist` edits, via prefix/suffix blocking.
   * Output: (a_id, b_id, a_name, b_name, dist, sim) with a_id < b_id,
   * each pair once, sim = 1 − dist / max(len) as a plain double
   * expression (deterministic — one division, no accumulation).
   */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockKeyLen: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val keys = blockingKeys(df, idCol, nameCol, blockKeyLen)
    val capped = maxBucket match {
      case Some(cap) =>
        // viral-block guard: count per key pre-join, drop oversized
        val sizes = keys.groupBy("blk").agg(count(lit(1)).as("__n"))
        keys.join(broadcast(sizes.filter(col("__n") <= cap)), Seq("blk"))
          .drop("__n")
      case None => keys
    }
    val a = capped.select(col("blk"), col("id").as("a_id"), col("name").as("a_name"))
    val b = capped.select(col("blk"), col("id").as("b_id"), col("name").as("b_name"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_name", "b_name")
      .distinct() // pairs sharing several blocks verify once
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .withColumn("sim",
        lit(1.0) - col("dist").cast("double") /
          greatest(length(col("a_name")), length(col("b_name"))).cast("double"))
  }

  /**
   * Entity assignment: every record mapped to the min record id of its
   * fuzzy-match component (singletons map to themselves). Pointer
   * doubling over the match edges — O(log diameter) rounds, and fuzzy
   * clusters are shallow (diameter ≤ a few edits) in practice.
   */
  def resolveEntities(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockKeyLen: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val pairs = fuzzyPairs(df, idCol, nameCol, maxDist, blockKeyLen, maxBucket)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val labels = ConnectedComponents.components(pairs, "src", "dst") // (id, component)
    df.select(col(idCol).as("record_id"), col(nameCol).as("name"))
      .join(labels.withColumnRenamed("id", "record_id"), Seq("record_id"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("record_id")))
      .select("record_id", "name", "entity_id")
  }
}
