package graft.operators

import graft.SparkFunSuite

/** FD and RI profiling cards: holds/violations exact, NULL fk
  * semantics, verdicts as data. */
class ProfilingSpec extends SparkFunSuite {
  import spark.implicits._

  test("functional dependency: holds, fails with violation count") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a"),
      (4L, "a"), (4L, "b"), (5L, "c"), (5L, "d"), (5L, "e"))
      .toDF("k", "v")
    val r = Profiling.functionalDependency(df, "t", "k", "v")
      .collect().head
    // keys {1..5}; 4 has 2 values (+1), 5 has 3 (+2) → 8 pairs, 3 extra
    assert((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)) ===
      ((5L, 8L, false, 3L)))
    val ok = Profiling.functionalDependency(
      df.filter($"k" <= 3), "t", "k", "v").collect().head
    assert(ok.getBoolean(4) && ok.getLong(5) === 0L)
  }

  test("referential integrity: orphans counted, NULL fks skipped") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profiling.referentialIntegrity(child, "fk", parent, "pk", "c->p")
      .collect().head
    // 5 non-null fk rows, 2 orphan rows (both key 9), 1 orphan key
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ===
      ((5L, 2L, 1L, false)))
    val clean = Profiling.referentialIntegrity(
      child.filter($"fk" =!= 9L), "fk", parent, "pk", "c->p")
      .collect().head
    assert(clean.getBoolean(4))
  }
}
