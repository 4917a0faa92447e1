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
}
