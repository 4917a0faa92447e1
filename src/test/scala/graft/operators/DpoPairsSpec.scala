package graft.operators

import graft.SparkFunSuite

/** DPO pair prep: chosen/rejected selection, the documented tie-break
  * direction, and the strict-margin filter. */
class DpoPairsSpec extends SparkFunSuite {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, String, Long)]) =
    ObjectivePrep.dpoPairs(
      rows.toDF("prompt_id", "cand_id", "resp", "score"),
      "prompt_id", "cand_id", "resp", "score")
      .orderBy("prompt_id")

  test("best and worst scored candidates become chosen/rejected") {
    val out = pairs(Seq(
      (1L, 10L, "a", 5L), (1L, 11L, "b", 9L), (1L, 12L, "c", 2L))).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("chosen_id") === 11L && r.getAs[String]("chosen") === "b")
    assert(r.getAs[Long]("rejected_id") === 12L && r.getAs[String]("rejected") === "c")
    assert(r.getAs[Long]("margin") === 7L && r.getAs[Long]("n_cands") === 3L)
  }

  test("score ties resolve to larger id for chosen, smaller for rejected") {
    val top = pairs(Seq(
      (1L, 10L, "a", 5L), (1L, 11L, "b", 5L), (1L, 12L, "c", 3L))).collect()(0)
    assert(top.getAs[Long]("chosen_id") === 11L)
    assert(top.getAs[Long]("rejected_id") === 12L)
    val bottom = pairs(Seq(
      (1L, 10L, "a", 5L), (1L, 11L, "b", 3L), (1L, 12L, "c", 3L))).collect()(0)
    assert(bottom.getAs[Long]("chosen_id") === 10L)
    assert(bottom.getAs[Long]("rejected_id") === 11L)
  }

  test("zero-margin groups and singleton groups emit nothing") {
    val out = pairs(Seq(
      (1L, 10L, "a", 4L), (1L, 11L, "b", 4L), // all tied
      (2L, 20L, "c", 9L))) // singleton
    assert(out.count() === 0L)
  }
}
