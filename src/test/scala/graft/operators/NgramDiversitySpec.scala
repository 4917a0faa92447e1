package graft.operators

import org.apache.spark.sql.Row

import graft.SparkFunSuite

/** Corpus distinct-n diversity: hand-computed card on a tiny corpus,
  * null/empty/short-doc edges, and the HLL variant pinned against the
  * exact card on real data. */
class NgramDiversitySpec extends SparkFunSuite {
  import spark.implicits._

  test("hand-computed card: totals, distincts, ratios") {
    val docs = Seq(Some("a b a"), Some("a b"), Some(""), None).toDF("text")
    val got = TextAnalysis.ngramDiversity(docs, "text").orderBy("n").collect()
    // 1-grams: a,b,a + a,b → 5 total, {a,b} distinct
    // 2-grams: "a b","b a" + "a b" → 3 total, 2 distinct
    // 3-grams: "a b a" only (doc 2 is too short) → 1 total, 1 distinct
    assert(got.toSeq === Seq(
      Row(1L, 5L, 2L, 0.4),
      Row(2L, 3L, 2L, 0.666667),
      Row(3L, 1L, 1L, 1.0)))
  }

  test("repeated template corpus: falling ratios expose the duplication") {
    val docs = Seq.fill(50)("the quick brown fox").toDF("text")
    val got = TextAnalysis.ngramDiversity(docs, "text").orderBy("n").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(200L, 150L, 100L)) // totals
    assert(got.map(_.getLong(2)).toSeq === Seq(4L, 3L, 2L))       // distincts
  }

  test("HLL variant tracks the exact card within its error bound") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val exact = TextAnalysis.ngramDiversity(docs, "text").orderBy("n")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = TextAnalysis.ngramDiversityApprox(docs, "text", rsd = 0.02)
      .orderBy("n").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((n, ex) <- exact) {
      val ap = approx(n)
      assert(math.abs(ap - ex) <= math.max(4.0, 0.1 * ex),
        s"n=$n exact=$ex approx=$ap")
    }
    // totals are exact in both variants
    val t1 = TextAnalysis.ngramDiversity(docs, "text").orderBy("n")
      .collect().map(_.getLong(1)).toSeq
    val t2 = TextAnalysis.ngramDiversityApprox(docs, "text").orderBy("n")
      .collect().map(_.getLong(1)).toSeq
    assert(t1 === t2)
  }
}
