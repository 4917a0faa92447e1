package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/** Shingle-containment pairs: the quote-in-a-haystack hand case
  * Jaccard misses, exact micro arithmetic, the df-cap contract, and
  * randomized parity with a direct in-memory shingle reference. */
class ContainmentSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], thr: Long = 800000L,
      maxDf: Int = 1024) =
    Dedup.containmentPairs(rows.toDF("doc_id", "text").repartition(3),
      "doc_id", "text", thr, maxDf).collect()

  /** token-3-gram shingles, the kernel's contract. */
  private def shingles(text: String): Set[String] = {
    val t = text.split(" ").filter(_.nonEmpty).toSeq
    if (t.isEmpty) Set.empty
    else if (t.size < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  test("a quote inside a haystack: containment 1, Jaccard tiny") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val hay = (1 to 40).map(i => s"filler$i word$i pad$i").mkString(" ") +
      " " + quote + " " + (41 to 80).map(i => s"tail$i t$i u$i").mkString(" ")
    val got = run(Seq((1L, quote), (2L, hay)))
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(5) === 1000000L) // cont_a: every quote shingle in hay
    assert(r.getLong(6) < 100000L)    // cont_b: hay is mostly not the quote
    // Jaccard would be overlap/(n_a + n_b − overlap) — far below any
    // dedup threshold
    val j = r.getLong(4).toDouble / (r.getLong(2) + r.getLong(3) - r.getLong(4))
    assert(j < 0.05, s"jaccard $j")
  }

  test("df cap: pairs sharing only stop-shingles are out of contract") {
    // 5 docs all containing one viral shingle; with maxDf = 4 the
    // shared shingle is a stop-shingle → no candidates at all
    val viral = "common viral shingle"
    val docs = (1L to 5L).map(i => (i, s"$viral unique$i only$i"))
    assert(run(docs, thr = 1L, maxDf = 4).isEmpty)
    // raising the cap restores them (every pair shares exactly the
    // viral shingle)
    assert(run(docs, thr = 1L, maxDf = 5).length === 10)
  }

  test("property: pairs ≡ direct quadratic shingle reference") {
    val word = Gen.oneOf("a", "b", "c", "dd", "ee")
    val genDocs = for {
      n <- Gen.chooseNum(2, 8)
      docs <- Gen.listOfN(n, Gen.chooseNum(0, 10)
        .flatMap(len => Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val thr = 500000L
    val prop = Prop.forAll(genDocs) { docs =>
      val sh = docs.map { case (id, t) => id -> shingles(t) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        ov = (sa & sb).size.toLong
        ca = 1000000L * ov / sa.size
        cb = 1000000L * ov / sb.size
        if math.max(ca, cb) >= thr
      } yield (ia, ib, sa.size.toLong, sb.size.toLong, ov, ca, cb)).sortBy(p => (p._1, p._2))
      val got = run(docs, thr = thr).map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("deterministic under repartitioning; short-doc whole-text shingle") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
    val a = run(docs, thr = 1000000L)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    val b = Dedup.containmentPairs(
      docs.toDF("doc_id", "text").repartition(1), "doc_id", "text",
      1000000L, 1024).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
