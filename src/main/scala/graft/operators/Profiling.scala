package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Schema-semantics profiling — the two structural checks a pipeline
 * runs on UNFAMILIAR data before trusting joins and keys (the core of
 * FD-discovery systems like Papenbrock et al.'s and of every data
 * catalog's "quality" tab):
 *
 *  - FUNCTIONAL DEPENDENCY A → B: does each A value determine one B?
 *    Decides whether A is safe as a dedup/grouping key and whether a
 *    dimension can be collapsed. Checked exactly by cardinality
 *    algebra — `|distinct A| = |distinct (A,B)|` — two aggregates, no
 *    pairwise comparison.
 *  - REFERENTIAL INTEGRITY child.fk ⊆ parent.pk: orphan fact rows
 *    silently vanish from inner joins (the classic
 *    "revenue dropped 3% after the snapshot swap" bug). Counted
 *    exactly with one distinct + one anti join against the parent
 *    key set.
 *
 * Both emit verdicts as DATA (counts + booleans), not assertions —
 * [[Expectations]]' contract: gates consume cards, cards never throw.
 * Shape at 100 TB: per check, map-side-combined distincts on the key
 * columns only (nothing wide shuffles) and key-set anti joins the
 * planner broadcasts when the parent is a dimension.
 */
object Profiling {

  /** One FD check card: (relation, `a -> b`, |A|, |AB|, holds,
    * n_violating_keys). */
  def functionalDependency(
      df: DataFrame, relation: String, a: String, b: String): DataFrame = {
    // Pre-aggregate to the distinct (a, b) relation first: the direct
    // two-distinct agg plans as Expand (2× the input rows) through one
    // shuffle, the dominant task time of profile_fds at sf0.1 (4.2 s).
    // The distinct-pair relation dedups map-side and both counts derive
    // from it exactly: n_lhs = distinct non-null a (every a value
    // survives pair-distinct), n_pairs = pairs with both sides non-null
    // (countDistinct(a, b) skips any-null rows, so the count must too).
    val pairs = df.select(col(a).as("__a"), col(b).as("__b")).distinct()
    val counts = pairs.agg(
      countDistinct(col("__a")).as("n_lhs"),
      count(when(col("__a").isNotNull && col("__b").isNotNull, 1))
        .as("n_pairs"))
    counts.select(
      lit(relation).as("relation"),
      lit(s"$a -> $b").as("dependency"),
      col("n_lhs").cast("long").as("n_lhs"),
      col("n_pairs").cast("long").as("n_pairs"),
      (col("n_pairs") === col("n_lhs")).as("holds"),
      (col("n_pairs") - col("n_lhs")).cast("long").as("n_violating_keys"))
  }

  /** One RI check card: child.fk ⊆ parent.pk — row and key orphan
    * counts (NULL fks are not orphans; SQL joins skip them, so the
    * card must too). */
  def referentialIntegrity(
      child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, relation: String): DataFrame = {
    val fks = child.filter(col(childKey).isNotNull)
      .select(col(childKey).as("__fk"))
    val orphanRows = fks.join(
      parent.select(col(parentKey).as("__pk")),
      col("__fk") === col("__pk"), "left_anti")
    val rows = fks.agg(count(lit(1)).as("n_child_rows"))
    val orows = orphanRows.agg(
      count(lit(1)).as("n_orphan_rows"),
      countDistinct(col("__fk")).as("n_orphan_keys"))
    rows.crossJoin(broadcast(orows)).select(
      lit(relation).as("relation"),
      col("n_child_rows").cast("long").as("n_child_rows"),
      col("n_orphan_rows").cast("long").as("n_orphan_rows"),
      col("n_orphan_keys").cast("long").as("n_orphan_keys"),
      (col("n_orphan_rows") === 0).as("intact"))
  }
}
