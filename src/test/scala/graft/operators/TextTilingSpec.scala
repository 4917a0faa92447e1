package graft.operators

import graft.SparkFunSuite

/** TextTiling block segmentation: hand-built documents with known
  * topic shifts, boundary arithmetic, and determinism. */
class TextTilingSpec extends SparkFunSuite {
  import spark.implicits._

  private def seg(texts: (Long, String)*) =
    TextTiling.segments(texts.toDF("doc_id", "text"), "doc_id", "text",
      blockTokens = 4, thresholdMicro = 150000L)
      .orderBy("id", "seg_id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("seg_id"),
        r.getAs[Long]("first_block"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_tokens")))

  test("a clean topic shift opens exactly one boundary") {
    // blocks: [cat cat dog dog] [dog cat cat dog] (high overlap),
    // then [car bus car bus] (zero overlap with block 2) -> boundary
    val doc = "cat cat dog dog dog cat cat dog car bus car bus"
    assert(seg(1L -> doc) === Seq(
      (1L, 0L, 0L, 2L, 8L),
      (1L, 1L, 2L, 1L, 4L)))
  }

  test("uniform vocabulary never splits; disjoint blocks always split") {
    val uniform = Seq.fill(6)("alpha beta gamma delta").mkString(" ")
    val got = seg(2L -> uniform)
    assert(got === Seq((2L, 0L, 0L, 6L, 24L)))
    // every block disjoint: words 0..15 distinct
    val disjoint = (0 until 16).map(i => s"w$i").mkString(" ")
    val g2 = seg(3L -> disjoint)
    assert(g2.length === 4) // 4 blocks, 3 boundaries -> 4 segments
    assert(g2.map(_._4).sum === 4L && g2.map(_._5).sum === 16L)
  }

  test("jaccard threshold is exact on the micro grid") {
    // adjacent blocks share 1 of 7 distinct -> 142857 < 150000: split;
    // share 1 of 6 -> 166666 >= 150000: no split
    val splitDoc = "a b c d d e f g" // {a,b,c,d} vs {d,e,f,g}: 1/7
    assert(seg(4L -> splitDoc).length === 2)
    val noSplit = "a b c d d e f d" // {a,b,c,d} vs {d,e,f}: 1/6
    assert(seg(5L -> noSplit).length === 1)
  }

  test("ragged tail block and determinism under repartition") {
    val doc = "x y z w x y z w v" // 2 full blocks + 1-token tail {v}
    val got = seg(6L -> doc)
    assert(got.map(_._5).sum === 9L)
    val df = (0L until 50L).map(i =>
      (i, (0 until 37).map(j => s"t${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextTiling.segments(df, "doc_id", "text")
      .orderBy("id", "seg_id").collect().map(_.toSeq).toSeq
    val b = TextTiling.segments(df.repartition(7), "doc_id", "text")
      .orderBy("id", "seg_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
