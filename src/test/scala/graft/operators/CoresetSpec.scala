package graft.operators

import graft.SparkFunSuite

/** Greedy k-center selection: hand-computed farthest-point traversal,
  * tie-breaks, determinism under repartition, and k ≥ n. */
class CoresetSpec extends SparkFunSuite {
  import spark.implicits._

  // unit 2-D vectors with exactly-representable cosines
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.96f, 0.28f)),  // cos to #1 = 0.96
    (3L, Array(0.0f, 1.0f)),    // cos to #1 = 0,    to #4 = 0.6
    (4L, Array(-0.8f, 0.6f)),   // cos to #1 = -0.8
    (5L, Array(0.6f, 0.8f))     // cos to #1 = 0.6,  to #4 = 0
  ).toDF("vec_id", "embedding")

  test("farthest-point traversal: picks, radii, and least-id tie-break") {
    val got = Coreset.kCenterSeeds(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // round 2: argmin cos-to-#1 → #4 (-0.8); round 3: #3 and #5 tie at
    // maxsim 600000 → least id 3; round 4: #5 (maxsim now 0.8 via #3)
    assert(got.toSeq === Seq(
      (1L, 1L, -1000000L),
      (2L, 4L, -800000L),
      (3L, 3L, 600000L),
      (4L, 5L, 800000L)))
  }

  test("deterministic under repartition") {
    val a = Coreset.kCenterSeeds(vecs, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSeq
    val b = Coreset.kCenterSeeds(vecs.repartition(7), "vec_id",
      "embedding", k = 3)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("k beyond the corpus selects everything, then stops") {
    val got = Coreset.kCenterSeeds(vecs, "vec_id", "embedding", k = 9)
      .collect()
    assert(got.length === 5)
    assert(got.map(_.getLong(1)).toSet === Set(1L, 2L, 3L, 4L, 5L))
  }
}
