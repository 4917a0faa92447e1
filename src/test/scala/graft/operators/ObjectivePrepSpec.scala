package graft.operators

import graft.SparkFunSuite

/** MLM corruption: determinism, mask-rate sanity, input/target
  * consistency, and exact reconstruction. */
class ObjectivePrepSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 200).map(i => s"w$i").mkString(" ")),
    (2L, "single"),
    (3L, "a b c d e f g h i j")
  ).toDF("doc_id", "text")

  test("deterministic under repartitioning; mask rate near 1/7") {
    val a = ObjectivePrep.mlmCorruption(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = ObjectivePrep.mlmCorruption(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val r = a.head
    val rate = r.getAs[Long]("n_masked").toDouble / r.getAs[Long]("n_tokens")
    assert(rate > 0.05 && rate < 0.30, s"rate $rate") // 200 tokens at 1/7
  }

  test("input and target reconstruct the original text exactly") {
    val rows = ObjectivePrep.mlmCorruption(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val orig = docs.orderBy("doc_id").collect().map(_.getString(1))
    rows.zip(orig).foreach { case (r, text) =>
      val input = r.getAs[String]("input_text").split(" ", -1)
      val target = r.getAs[String]("target_text")
      val targets = if (target.isEmpty) Iterator.empty else target.split(" ", -1).iterator
      val rebuilt = input.map(t => if (t == "[MASK]") targets.next() else t)
      assert(rebuilt.mkString(" ") === text)
      assert(targets.isEmpty) // every target token consumed in order
      assert(input.length === r.getAs[Long]("n_tokens"))
      assert(input.count(_ == "[MASK]") === r.getAs[Long]("n_masked"))
    }
  }

  test("masked positions depend on the doc id (identical texts corrupt differently)") {
    val same = Seq((10L, "x y z " * 50), (11L, "x y z " * 50))
      .toDF("doc_id", "text")
    val got = ObjectivePrep.mlmCorruption(same, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("input_text") !==
      got(1).getAs[String]("input_text"))
  }
}
