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
}
