package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Snapshot MERGE: insert/update/delete semantics, pass-through of
  * untouched rows, rejection of ill-formed changes (with the snapshot
  * side preserved), and the single-join plan shape. */
class SnapshotSpec extends SparkFunSuite {
  import spark.implicits._

  private val snap = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30)
  ).toDF("id", "name", "v")

  test("changeDataFeed: insert/delete/update classes; unchanged rows silent") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "p1", "p2")
    val nw = Seq((2L, "b", "y"), (3L, "c", "CHANGED"), (4L, "d", "w"))
      .toDF("id", "p1", "p2")
    val cdf = Snapshot.changeDataFeed(old, nw, "id", Seq("p1", "p2"))
      .orderBy("id").collect()
    assert(cdf.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (1L, "delete"), (3L, "update"), (4L, "insert")))
    // delete carries only the old fingerprint; insert only the new
    assert(cdf(0).isNullAt(3) && !cdf(0).isNullAt(2))
    assert(cdf(2).isNullAt(2) && !cdf(2).isNullAt(3))
  }

  test("changeDataFeed: multi-column payloads never collide across boundaries") {
    val old = Seq((1L, "ab", "c")).toDF("id", "p1", "p2")
    val nw = Seq((1L, "a", "bc")).toDF("id", "p1", "p2")
    val cdf = Snapshot.changeDataFeed(old, nw, "id", Seq("p1", "p2")).collect()
    assert(cdf.length === 1 && cdf(0).getString(1) === "update")
  }

  private def changes(rows: (Long, String, Int, String)*) =
    rows.toDF("id", "name", "v", "op")

  test("I/U/D apply; untouched rows pass through") {
    val next = Snapshot.merge(snap,
      changes((2L, "TWO", 22, "U"), (3L, "", 0, "D"), (4L, "four", 40, "I")),
      "id").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(next.toSeq === Seq((1L, "one", 10), (2L, "TWO", 22), (4L, "four", 40)))
  }

  test("ill-formed changes reject; snapshot side survives") {
    val (next, rejected) = Snapshot.mergeWithRejects(snap,
      changes(
        (1L, "dup", 99, "I"),  // I on existing id
        (8L, "nope", 0, "U"),  // U on missing id
        (9L, "nope", 0, "D")), // D on missing id
      "id")
    assert(next.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "one"), (2L, "two"), (3L, "three")))
    assert(rejected.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "I"), (8L, "U"), (9L, "D")))
  }

  test("replayed changeset is safe: updates idempotent, inserts rejected, snapshot stable") {
    // the exactly-once concern: a retried batch must not corrupt the
    // table — U re-applies to the same value, I on the now-existing id
    // REJECTS (surfaced, not applied), D on the now-missing id rejects
    val changes = Seq(
      (2L, "two2", 22, "U"), (4L, "four", 40, "I"), (3L, "three", 30, "D")
    ).toDF("id", "name", "v", "op")
    val once = Snapshot.merge(snap, changes, "id")
    val (twice, rejected) = Snapshot.mergeWithRejects(once, changes, "id")
    assert(twice.orderBy("id").collect().toSeq ===
      once.orderBy("id").collect().toSeq)
    // the replayed insert and delete surface as rejects; the update does not
    assert(rejected.select("id", "op").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((3L, "D"), (4L, "I")))
  }

  test("empty changeset is the identity") {
    val next = Snapshot.merge(snap, changes(), "id")
    assert(next.orderBy("id").collect().toSeq ===
      snap.orderBy("id").collect().toSeq)
  }

  test("plan: ONE full-outer equality join, no window, no second join") {
    val plan = Snapshot.merge(snap,
      changes((2L, "TWO", 22, "U")), "id")
      .queryExecution.optimizedPlan.toString
    assert(plan.sliding(4).count(_ == "Join") <= 2) // kept + rejected-snap union
    assert(!plan.contains("Window"))
  }

  // ----------------------------------------------------------- SCD2

  private def hist(rows: (Long, Long, String)*) =
    Snapshot.scd2(rows.toDF("id", "version", "tier"), "id", "version",
      Seq("tier")).orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSeq

  test("scd2: unchanged payload collapses to one open interval") {
    assert(hist((1L, 1L, "low"), (1L, 2L, "low"), (1L, 3L, "low")) ===
      Seq((1L, "low", 1L, None, true)))
  }

  test("scd2: each change opens a new interval and closes the prior") {
    assert(hist((1L, 1L, "low"), (1L, 2L, "mid"), (1L, 3L, "mid"), (1L, 4L, "high")) ===
      Seq((1L, "low", 1L, Some(2L), false),
          (1L, "mid", 2L, Some(4L), false),
          (1L, "high", 4L, None, true)))
  }

  test("scd2: a key appearing late starts at its first observed version") {
    assert(hist((1L, 1L, "a"), (2L, 3L, "b"), (2L, 4L, "c")) ===
      Seq((1L, "a", 1L, None, true),
          (2L, "b", 3L, Some(4L), false),
          (2L, "c", 4L, None, true)))
  }

  test("scd2: payload returning to an old value is a NEW interval (type 2, not type 1)") {
    assert(hist((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a")) ===
      Seq((1L, "a", 1L, Some(2L), false),
          (1L, "b", 2L, Some(3L), false),
          (1L, "a", 3L, None, true)))
  }

  test("scd2: null payload is a distinct state from any string") {
    val rows = Seq((1L, 1L, "x"), (1L, 2L, null), (1L, 3L, "x"))
      .toDF("id", "version", "tier")
    val out = Snapshot.scd2(rows, "id", "version", Seq("tier"))
      .orderBy("valid_from").collect()
    assert(out.length === 3) // x -> null -> x = three intervals
    assert(out(1).isNullAt(1) && out(1).getLong(2) === 2L)
  }

  test("scd2: plan has no self-join — one shuffle, window-based") {
    val rows = Seq((1L, 1L, "x")).toDF("id", "version", "tier")
    val plan = Snapshot.scd2(rows, "id", "version", Seq("tier"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("scd2Lookup: facts pick the interval valid at their version; misses keep nulls") {
    val hist = Snapshot.scd2(
      Seq((1L, 1L, "low"), (1L, 3L, "mid"), (2L, 2L, "high"))
        .toDF("id", "version", "tier"),
      "id", "version", Seq("tier"))
    val facts = Seq((10L, 1L, 1L), (11L, 1L, 2L), (12L, 1L, 5L),
      (13L, 2L, 1L), (14L, 2L, 9L), (15L, 3L, 2L))
      .toDF("fact_id", "id", "version")
    val out = Snapshot.scd2Lookup(facts, hist, "id", "version")
      .orderBy("fact_id")
      .collect().map(r => (r.getAs[Long]("fact_id"),
        Option(r.getAs[String]("tier")))).toSeq
    assert(out === Seq(
      (10L, Some("low")),   // v=1 in [1,3)
      (11L, Some("low")),   // v=2 in [1,3)
      (12L, Some("mid")),   // v=5 in [3,null)
      (13L, None),          // before key 2's first interval
      (14L, Some("high")),  // open current interval
      (15L, None)))         // unknown key
  }

  test("scd2 + lookup on a DATE version domain: half-open intervals leave no gap") {
    // the old closed-interval form computed valid_to = lead - 1, which
    // only works for contiguous integers; dates/timestamps between two
    // change points fell in no interval. Half-open bounds fix that.
    import java.sql.Date
    val dims = Seq(
      (1L, Date.valueOf("2024-01-01"), "low"),
      (1L, Date.valueOf("2024-03-01"), "mid"))
      .toDF("id", "version", "tier")
    val h = Snapshot.scd2(dims, "id", "version", Seq("tier"))
    val rows = h.orderBy("valid_from").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Date]("valid_to_excl") === Date.valueOf("2024-03-01"))
    assert(rows(1).get(rows(1).fieldIndex("valid_to_excl")) === null)
    val facts = Seq(
      (10L, 1L, Date.valueOf("2024-02-10")), // strictly between changes
      (11L, 1L, Date.valueOf("2024-03-01")), // exactly at the change
      (12L, 1L, Date.valueOf("2023-12-31"))) // before first interval
      .toDF("fact_id", "id", "version")
    val out = Snapshot.scd2Lookup(facts, h, "id", "version")
      .orderBy("fact_id")
      .collect().map(r => Option(r.getAs[String]("tier"))).toSeq
    assert(out === Seq(Some("low"), Some("mid"), None))
  }

  test("scd2Lookup plans a hash join (equality key + interval residual), never a nested loop") {
    val hist = Snapshot.scd2(Seq((1L, 1L, "x")).toDF("id", "version", "tier"),
      "id", "version", Seq("tier"))
    val facts = Seq((10L, 1L, 1L)).toDF("fact_id", "id", "version")
    val plan = Snapshot.scd2Lookup(facts, hist, "id", "version")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
