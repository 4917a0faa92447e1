package graft.operators

import graft.SparkFunSuite

/** Hand-derived schedules: per-host top-k by (priority DESC, id ASC),
  * slot s fetched at s·delay_ms. */
class FrontierSpec extends SparkFunSuite {

  private def run(
      rows: Seq[(String, Long, Long, Long)], k: Int): Seq[(String, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Frontier.schedule(
        rows.toDF("host", "url_id", "priority", "delay_ms").repartition(3), k)
      .orderBy("host", "slot")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
  }

  test("top-k per host, priority desc, id tie-break asc, slot spacing") {
    val cand = Seq(
      ("a.com", 1L, 5L, 1000L),
      ("a.com", 2L, 9L, 1000L),
      ("a.com", 3L, 9L, 1000L), // ties with id 2 → id 2 first
      ("a.com", 4L, 1L, 1000L), // falls off at k=3
      ("b.org", 7L, 2L, 2500L))
    assert(run(cand, k = 3) === Seq(
      ("a.com", 0L, 2L, 9L, 0L),
      ("a.com", 1L, 3L, 9L, 1000L),
      ("a.com", 2L, 1L, 5L, 2000L),
      ("b.org", 0L, 7L, 2L, 0L)))
  }

  test("hosts with fewer than k candidates schedule them all") {
    val cand = Seq(("x.io", 10L, 0L, 500L), ("x.io", 11L, 7L, 500L))
    assert(run(cand, k = 5) === Seq(
      ("x.io", 0L, 11L, 7L, 0L),
      ("x.io", 1L, 10L, 0L, 500L)))
  }

  test("viral host truncates to exactly k regardless of volume") {
    val cand = (0 until 5000).map(i =>
      ("big.com", i.toLong, (i % 17).toLong, 100L))
    val got = run(cand, k = 8)
    assert(got.size === 8)
    // Best priority is 16; ids with priority 16 are 16, 33, 50, ...
    assert(got.head === ("big.com", 0L, 16L, 16L, 0L))
    assert(got.map(_._2) === (0L until 8L))
    assert(got.map(_._5) === (0L until 8L).map(_ * 100L))
    // All kept rows carry the max priority (5000/17 ≈ 294 ≥ 8 of them).
    assert(got.forall(_._4 === 16L))
  }
}
