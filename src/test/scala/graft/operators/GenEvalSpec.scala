package graft.operators

import graft.SparkFunSuite

class GenEvalSpec extends SparkFunSuite {

  import spark.implicits._

  test("token F1: hand-computed multiset overlap") {
    val pairs = Seq(
      (1L, "a b c", "a b d"),   // overlap 2 of 3/3
      (2L, "a a a", "a a"),     // multiset: overlap 2, p=2/3, r=1
      (3L, "x y", "x y"))       // perfect
      .toDF("id", "pred", "gold")
    val got = GenEval.overlapF1(pairs, "id", "pred", "gold")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) === ((3L, 3L, 2L, 666666L, 666666L, 666666L)))
    assert(got(2L) === ((3L, 2L, 2L, 666666L, 1000000L, 800000L)))
    assert(got(3L) === ((2L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("ROUGE-2: bigram units, single-token sides score zero") {
    val pairs = Seq(
      (1L, "a b c", "a b d"),   // pred {a b, b c}, gold {a b, b d} → 1
      (2L, "a", "a b"))         // pred has no bigram → zeros, not null
      .toDF("id", "pred", "gold")
    val got = GenEval.overlapF1(pairs, "id", "pred", "gold", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    assert(got(1L) === ((2L, 1L, 500000L, 500000L)))
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
  }

  test("deterministic across partitionings") {
    val pairs = (1L to 300L)
      .map(i => (i, s"w${i % 9} x y w${i % 4}", s"w${i % 9} x z"))
      .toDF("id", "pred", "gold")
    val a = GenEval.overlapF1(pairs.repartition(1), "id", "pred", "gold")
      .orderBy("id").collect().toSeq
    val b = GenEval.overlapF1(pairs.repartition(11), "id", "pred", "gold")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("corpusBleu: hand-computed clipped precisions and brevity penalty") {
    import org.apache.spark.sql.functions._
    // pred "a b c d", gold "a b c e": p1 = 3/4, p2 = 2/3, p3 = 1/2,
    // p4 = 0/1 → bleu = 0 (zero 4-gram matches, the convention)
    val pairs = Seq((1L, "a b c d", "a b c e")).toDF("id", "pred", "gold")
    val r4 = GenEval.corpusBleu(pairs, "id", "pred", "gold", maxN = 4)
      .collect().head
    assert(r4.getAs[Long]("c") === 4L)
    assert(r4.getAs[Long]("r") === 4L)
    assert(r4.getAs[Long]("p1_micro") === 750000L)
    assert(r4.getAs[Long]("p2_micro") === 666666L)
    assert(r4.getAs[Long]("p3_micro") === 500000L)
    assert(r4.getAs[Long]("p4_micro") === 0L)
    assert(r4.getAs[Double]("bleu") === 0.0)
    // BLEU-2 on the same pair: exp(ln(3/4)/2 + ln(2/3)/2), BP = 1
    val r2 = GenEval.corpusBleu(pairs, "id", "pred", "gold", maxN = 2)
      .collect().head
    val want = BigDecimal(math.exp((math.log(3.0 / 4) + math.log(2.0 / 3)) / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getAs[Double]("bleu") === want)
    // clipping: pred repeats "a" 4x, gold has 2 → p1 = 2/4
    val clip = Seq((1L, "a a a a", "a a")).toDF("id", "pred", "gold")
    val rc = GenEval.corpusBleu(clip, "id", "pred", "gold", maxN = 1)
      .collect().head
    assert(rc.getAs[Long]("p1_micro") === 500000L)
    // short pred vs long gold: BP < 1 (c=2, r=4)
    val bp = Seq((1L, "a b", "a b c d")).toDF("id", "pred", "gold")
    val rb = GenEval.corpusBleu(bp, "id", "pred", "gold", maxN = 1)
      .collect().head
    val wantBp = BigDecimal(math.exp((1.0 - 4.0 / 2) + math.log(1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rb.getAs[Double]("bleu") === wantBp)
  }

  test("corpusChrF: hand-computed char n-gram F-beta") {
    import org.apache.spark.sql.functions._
    // identical strings → perfect at every order
    val same = Seq((1L, "a b", "a b")).toDF("id", "pred", "gold")
    val r1 = GenEval.corpusChrF(same, "id", "pred", "gold", maxN = 2)
      .collect().head
    assert(r1.getAs[Long]("f1_micro") === 1000000L)
    assert(r1.getAs[Long]("f2_micro") === 1000000L)
    assert(r1.getAs[Long]("chrf_micro") === 1000000L)
    // transposition: unigrams perfect, bigrams disjoint ("ab" vs "ba")
    val swap = Seq((1L, "ab", "ba")).toDF("id", "pred", "gold")
    val r2 = GenEval.corpusChrF(swap, "id", "pred", "gold", maxN = 2)
      .collect().head
    assert(r2.getAs[Long]("f1_micro") === 1000000L)
    assert(r2.getAs[Long]("f2_micro") === 0L)
    assert(r2.getAs[Long]("chrf_micro") === 500000L)
    // beta = 2 weights recall: pred "aab" vs gold "ab" at n = 1:
    // P = 666666, R = 1e6 → F2 = 5PR div (4P + R) = 909090
    val rec = Seq((1L, "aab", "ab")).toDF("id", "pred", "gold")
    val r3 = GenEval.corpusChrF(rec, "id", "pred", "gold", maxN = 1)
      .collect().head
    assert(r3.getAs[Long]("f1_micro") === 909090L)
  }

  test("sentenceBleu: add-one smoothing, hand-computed per pair") {
    val pairs = Seq(
      (1L, "a b c d", "a b c e"),  // o=[3,2,1,0], t=[4,3,2,1]
      (2L, "x", "a"),              // zero unigram matches → bleu 0
      (3L, "a", "a"))              // perfect; n≥2 all (0+1)/(0+1)
      .toDF("id", "pred", "gold")
    val got = GenEval.sentenceBleu(pairs, "id", "pred", "gold", maxN = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("c") === 4L && r1.getAs[Long]("r") === 4L)
    assert(r1.getAs[Long]("p1_micro") === 750000L)
    assert(r1.getAs[Long]("p2_micro") === 750000L)  // (2+1)/(3+1)
    assert(r1.getAs[Long]("p3_micro") === 666666L)  // (1+1)/(2+1)
    assert(r1.getAs[Long]("p4_micro") === 500000L)  // (0+1)/(1+1)
    val want = BigDecimal(math.exp((math.log(3.0 / 4) + math.log(3.0 / 4) +
      math.log(2.0 / 3) + math.log(1.0 / 2)) / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("bleu") === want)
    assert(got(2L).getAs[Long]("p1_micro") === 0L)
    assert(got(2L).getAs[Double]("bleu") === 0.0)
    assert(got(3L).getAs[Double]("bleu") === 1.0)
  }

  test("corpusChrFpp: char + word orders, equal-weight mean") {
    // identical strings → perfect at every order, char and word
    val same = Seq((1L, "ab cd", "ab cd")).toDF("id", "pred", "gold")
    val r1 = GenEval.corpusChrFpp(same, "id", "pred", "gold",
      charMaxN = 2, wordMaxN = 2).collect().head
    assert(r1.getAs[Long]("fc1_micro") === 1000000L)
    assert(r1.getAs[Long]("fc2_micro") === 1000000L)
    assert(r1.getAs[Long]("fw1_micro") === 1000000L)
    assert(r1.getAs[Long]("fw2_micro") === 1000000L)
    assert(r1.getAs[Long]("chrfpp_micro") === 1000000L)
    // transposed chars: fc1 perfect, fc2/fw1 disjoint, fw2 has no
    // bigrams on either side (single token) → 0 — mean = 1e6 div 4
    val swap = Seq((1L, "ab", "ba")).toDF("id", "pred", "gold")
    val r2 = GenEval.corpusChrFpp(swap, "id", "pred", "gold",
      charMaxN = 2, wordMaxN = 2).collect().head
    assert(r2.getAs[Long]("fc1_micro") === 1000000L)
    assert(r2.getAs[Long]("fc2_micro") === 0L)
    assert(r2.getAs[Long]("fw1_micro") === 0L)
    assert(r2.getAs[Long]("fw2_micro") === 0L)
    assert(r2.getAs[Long]("chrfpp_micro") === 250000L)
    // char F2 recall-weighting carries over; word order contributes 0
    val rec = Seq((1L, "aab", "ab")).toDF("id", "pred", "gold")
    val r3 = GenEval.corpusChrFpp(rec, "id", "pred", "gold",
      charMaxN = 1, wordMaxN = 1).collect().head
    assert(r3.getAs[Long]("fc1_micro") === 909090L)
    assert(r3.getAs[Long]("fw1_micro") === 0L)
    assert(r3.getAs[Long]("chrfpp_micro") === 454545L)
  }

  test("selfBleu: identical sample scores 1, disjoint vocab scores 0") {
    import spark.implicits._
    val same = Seq((0L, "x y z"), (1L, "x y z"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val r1 = GenEval.selfBleu(same, "doc_id", "text")
      .collect().head
    assert(r1.getLong(0) === 6L) // 3·2 ordered pairs
    assert(r1.getDouble(1) === 1.0)
    val disjoint = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val r2 = GenEval.selfBleu(disjoint, "doc_id", "text")
      .collect().head
    assert(r2.getLong(0) === 2L)
    assert(r2.getDouble(1) === 0.0)
  }

  test("selfBleu: pair grid is bounded by sampleSize, not corpus size") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"tok$i a b")).toDF("doc_id", "text")
    val r = GenEval.selfBleu(docs, "doc_id", "text", sampleSize = 10)
      .collect().head
    assert(r.getLong(0) === 90L) // 10·9 ordered pairs, never 100·99
    // deterministic: same seed → same sample → same score
    val r2 = GenEval.selfBleu(docs, "doc_id", "text", sampleSize = 10)
      .collect().head
    assert(r.getDouble(1) === r2.getDouble(1))
  }

  test("distinctN: hand-counted unique/total grams; short docs skip high orders") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = GenEval.distinctN(docs, "text").orderBy("n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, 6L, 3L, 500000L),   // a,b,a,b,a,c
      (2L, 4L, 3L, 750000L),   // "a b","b a","a b","a c"
      (3L, 2L, 2L, 1000000L),  // doc 2 too short for trigrams
      (4L, 1L, 1L, 1000000L)))
  }
}
