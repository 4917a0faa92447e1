package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot merge (incremental corpus refresh): apply a keyed changeset
 * — inserts, updates, deletes — to the previous corpus snapshot in one
 * pass, the MERGE INTO of lakehouse engines expressed as a plain full
 * outer join. A monthly crawl refresh at 100 TB re-writes the corpus
 * this way rather than re-ingesting from zero: the changeset is
 * orders of magnitude smaller than the snapshot, the join shuffles on
 * the id both sides are already keyed by, and AQE broadcast-converts
 * when the changeset is small enough (the common case — which is why
 * this is not a window or an anti-join chain: ONE join, ONE output
 * pass).
 *
 * Semantics (Delta/Iceberg MERGE with whenMatched update/delete +
 * whenNotMatched insert):
 *  - op = "U" and id matched  → changeset row replaces the payload
 *  - op = "D" and id matched  → row dropped
 *  - op = "I" and id missing  → changeset row inserted
 *  - snapshot rows without a change pass through
 *  - ill-formed changes (I on an existing id, U/D on a missing id)
 *    are REJECTED to a side relation, never silently applied — the
 *    audit trail a production refresh requires.
 */
object Snapshot {

  /** Apply `changes` (idCol, op ∈ I/U/D, payload columns matching
    * `snapshot`) — returns the next snapshot. */
  def merge(snapshot: DataFrame, changes: DataFrame, idCol: String): DataFrame =
    mergeWithRejects(snapshot, changes, idCol)._1

  /** (nextSnapshot, rejectedChanges). */
  def mergeWithRejects(
      snapshot: DataFrame, changes: DataFrame,
      idCol: String): (DataFrame, DataFrame) = {
    val payload = snapshot.columns.filterNot(_ == idCol).toSeq
    require(changes.columns.toSet == (snapshot.columns :+ "op").toSet,
      s"changeset must carry (${snapshot.columns.mkString(", ")}, op)")
    val s = snapshot.select(col(idCol) +: lit(true).as("__in_s") +:
      payload.map(c => col(c).as(s"__s_$c")): _*)
    val c = changes.select(col(idCol) +: col("op").as("__op") +:
      payload.map(c0 => col(c0).as(s"__c_$c0")): _*)
    val j = s.join(c, Seq(idCol), "full_outer")
    val matched = coalesce(col("__in_s"), lit(false))
    val applied =
      (col("__op").isNull) || // untouched snapshot row
        (col("__op") === "U" && matched) ||
        (col("__op") === "D" && matched) ||
        (col("__op") === "I" && !matched)
    // NB: op is NULL on untouched rows — the D-exclusion must be
    // null-safe or the filter's three-valued logic drops them
    val kept = j.filter(applied && !(col("__op") <=> "D"))
      .select(col(idCol) +: payload.map { p =>
        when(col("__op").isin("U", "I"), col(s"__c_$p"))
          .otherwise(col(s"__s_$p")).as(p)
      }: _*)
    // a rejected change leaves the snapshot side untouched: surface it
    val rejected = j.filter(col("__op").isNotNull && !applied)
      .select(col(idCol) +: col("__op").as("op") +:
        payload.map(p => col(s"__c_$p").as(p)): _*)
    val rejectedSnapshotRows = j
      .filter(col("__op").isNotNull && !applied && matched)
      .select(col(idCol) +: payload.map(p => col(s"__s_$p").as(p)): _*)
    (kept.unionByName(rejectedSnapshotRows), rejected)
  }

  /**
   * Change data feed between two keyed snapshots — the inverse of
   * [[merge]]: derive the (id, change_type) stream a CDC consumer
   * would replay, from plain snapshots, with ONE full-outer join on
   * the id both sides are stored by (AQE broadcast-converts when one
   * side is a small incremental snapshot). Payload comparison is by
   * md5 over the concatenated payload columns (unit-separator
   * delimited so ("ab","c") never collides with ("a","bc")); rows
   * with identical payloads emit NOTHING — a CDF is changes only.
   *
   * Output: (id, change_type ∈ insert/delete/update, old_fp, new_fp).
   */
  def changeDataFeed(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    def fp(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat_ws("\u001f", payloadCols.map(col): _*).cast("binary")).as(as))
    fp(oldSnap, "old_fp").join(fp(newSnap, "new_fp"), Seq(idCol), "full_outer")
      .withColumn("change_type",
        when(col("old_fp").isNull, "insert")
          .when(col("new_fp").isNull, "delete")
          .when(col("old_fp") =!= col("new_fp"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col(idCol), col("change_type"), col("old_fp"), col("new_fp"))
  }

  /**
   * Slowly-changing-dimension type-2 history from versioned snapshots
   * — the third leg of the snapshot toolkit beside [[merge]] (apply a
   * changeset) and [[changeDataFeed]] (diff two snapshots): given one
   * row per (key, version) for every version where the key exists,
   * collapse runs of identical payloads into HALF-OPEN validity
   * intervals `[valid_from, valid_to_excl)` with `is_current` on the
   * open interval. Half-open bounds make the history correct for ANY
   * ordered version domain — integers, dates, timestamps, even
   * strings — because no `- 1` arithmetic is ever applied to the
   * version: the interval simply ends where the next change begins,
   * so non-contiguous domains leave no unmatched gap. This is how a
   * dimension that arrives as periodic full snapshots (the common
   * case for crawl-source metadata, user segments, supplier
   * catalogs) becomes a point-in-time joinable history.
   *
   * Shape at scale: ONE shuffle on the key (the window partition);
   * within each key the versions sort locally (bounded by the number
   * of snapshot versions, not data size), `lag` marks change points,
   * `lead` closes intervals. No self-join, no driver state.
   *
   * Contract: a key absent from some versions simply contributes no
   * row there; an interval runs to the next CHANGE (absence between
   * two identical observations is invisible — for cumulative or
   * full-snapshot feeds absence means deletion, which callers model
   * by feeding an explicit tombstone payload).
   */
  def scd2(
      versions: DataFrame, keyCol: String, versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol).orderBy(versionCol)
    // unit-separator fingerprint: ("ab","c") never collides ("a","bc")
    val fp = md5(concat_ws("\u001f",
      payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val marked = versions
      .withColumn("__fp", fp)
      .withColumn("__changed",
        lag(col("__fp"), 1).over(byKey).isNull ||
          lag(col("__fp"), 1).over(byKey) =!= col("__fp"))
    val changePoints = marked.filter(col("__changed"))
    changePoints
      .withColumn("valid_to_excl", lead(col(versionCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to_excl").isNull)
      .select(col(keyCol) +: payloadCols.map(col) :+
        col(versionCol).as("valid_from") :+ col("valid_to_excl") :+
        col("is_current"): _*)
  }

  /**
   * Point-in-time (AS OF) lookup against an [[scd2]] history — the
   * consumer side of type-2 dimensions: each fact joins the ONE
   * dimension interval valid at its version
   * (`valid_from <= v < valid_to_excl`, open-ended for the current
   * row — the half-open match that is exact for any ordered version
   * domain).
   * The join keeps its EQUALITY key (the dimension key), so Spark
   * plans a hash join with the interval bounds as a residual
   * condition — never a nested-loop cross; with the history
   * broadcast-sized (it usually is: change points only) the fact
   * table doesn't even shuffle. Facts before the key's first
   * interval, or with no matching key, keep nulls (left join) — the
   * audit surface, not a silent drop.
   */
  def scd2Lookup(
      facts: DataFrame, history: DataFrame, keyCol: String,
      versionCol: String): DataFrame = {
    val h = history.withColumnRenamed(keyCol, "__hk")
    facts.join(h,
      facts(keyCol) === h("__hk") &&
        facts(versionCol) >= h("valid_from") &&
        (h("valid_to_excl").isNull || facts(versionCol) < h("valid_to_excl")),
      "left")
      .drop("__hk")
  }
}
