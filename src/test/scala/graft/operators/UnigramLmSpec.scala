package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkFunSuite {

  import spark.implicits._

  test("fitVocab: n-gram counts, 1-char fallback survives minCount") {
    val docs = Seq("ab ab b").toDF("text")
    val rows = UnigramLm.fitVocab(docs, "text", maxPiece = 4, minCount = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // words [ab, ab, b] → pieces a:2, b:3, ab:2; T = 7
    assert(rows.keySet === Set("a", "b", "ab"))
    assert(rows("a")._1 === 2L)
    assert(rows("b")._1 === 3L)
    assert(rows("ab")._1 === 2L)
    // scores are negative log-probs on the micro grid
    rows.values.foreach { case (_, s) => assert(s < 0L) }
    // rarer piece scores lower
    assert(rows("a")._2 < rows("b")._2)
    // 1-char fallback survives minCount: a word with a unique char
    val docs2 = Seq("ab ab b z").toDF("text")
    val v2 = UnigramLm.fitVocab(docs2, "text", minCount = 2)
      .collect().map(_.getString(0)).toSet
    assert(v2.contains("z"))
  }

  test("viterbi picks the maximum-likelihood split, fewest pieces on ties") {
    val docs = Seq("ab ab b").toDF("text")
    val vocab = UnigramLm.fitVocab(docs, "text")
    // log p(ab) = log(2/7) beats log p(a)+log p(b) = log(2/7)+log(3/7)
    val seg = UnigramLm.segmentWords(Seq("ab", "b").toDF("word"), vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(seg("ab")._2 === 1L)
    assert(seg("b")._2 === 1L)
    // exact packed-key arithmetic: logp(ab) = round(log10 2,6)−round(log10 7,6) micros
    val exp = (BigDecimal(math.log10(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      - BigDecimal(math.log10(7)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) * 1000000
    assert(seg("ab")._3 === exp.toLong)
  }

  test("segmentWords: OOV char and over-cap words emit NULL metrics") {
    val docs = Seq("ab ab b").toDF("text")
    val vocab = UnigramLm.fitVocab(docs, "text")
    val seg = UnigramLm.segmentWords(
      Seq("ab", "aq", "a" * 20).toDF("word"), vocab, maxWordLen = 16)
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(!seg("ab"))
    assert(seg("aq"))        // 'q' not in vocab
    assert(seg("a" * 20))    // over the 16-char cap
  }

  test("segmentCorpus: per-doc rollup; unsegmentable word poisons visibly") {
    val docs = Seq((1L, "ab ab b"), (2L, "ab " + "a" * 20)).toDF("id", "text")
    val vocab = UnigramLm.fitVocab(docs.select("text"), "text")
    val rows = UnigramLm.segmentCorpus(docs, "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(rows(1L) === ((3L, 3L)))   // ab, ab, b → one piece each
    assert(rows(2L)._2 === -1L)       // poisoned, not silently partial
  }

  test("deterministic across partitionings") {
    val docs = (1L to 200L).map(i => (i, s"tok${i % 7} ab tok${i % 5}"))
      .toDF("id", "text")
    val vocab = UnigramLm.fitVocab(docs.select("text"), "text")
    val a = UnigramLm.segmentCorpus(docs.repartition(1), "id", "text", vocab)
      .orderBy("id").collect().toSeq
    val b = UnigramLm.segmentCorpus(docs.repartition(13), "id", "text", vocab)
      .orderBy("id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("refit: viterbi recount matches hand segmentation; unused pieces keep 0") {
    val docs = Seq((1L, "ab ab b")).toDF("id", "text")
    val vocab = UnigramLm.fitVocab(docs.select("text"), "text")
    val rows = UnigramLm.refit(docs, "id", "text", vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.isNullAt(4)))).toMap
    // viterbi splits: "ab"→[ab] ×2 occurrences, "b"→[b] ×1
    assert(rows("ab") === ((2L, false)))
    assert(rows("b") === ((1L, false)))
    assert(rows("a") === ((0L, true)))  // never chosen → 0, null score
    // new scores re-normalize over viterbi mass (T = 3)
    val ns = UnigramLm.refit(docs, "id", "text", vocab)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) 0L else r.getLong(4))).toMap
    val exp = (BigDecimal(math.log10(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      - BigDecimal(math.log10(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) * 1000000
    assert(ns("ab") === exp.toLong)
  }

  test("refit: multi-piece backtrace emits every crossed piece") {
    // vocab without "abc" forces abc → [ab, c] or [a, bc]: the dp
    // tie-break (max likelihood) decides; both pieces must be counted
    val docs = Seq((1L, "abc ab bc c abc")).toDF("id", "text")
    val vocab = UnigramLm.fitVocab(docs.select("text"), "text", maxPiece = 2)
    val rows = UnigramLm.refit(docs, "id", "text", vocab, maxPiece = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // every occurrence of every word is segmented: total piece mass
    // equals sum over words of their piece counts; "abc" (x2) yields
    // exactly 2 pieces each under a 2-char-max vocab
    val mass = rows.values.sum
    assert(mass === 2L * 2 + 1 + 1 + 1) // abc x2 -> 2 pieces each; ab, bc, c -> 1 each
  }

  test("segmentCorpus plan: word table broadcast, no shuffled fact join") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"tok${i % 5} ab")).toDF("id", "text")
    val vocab = UnigramLm.fitVocab(docs.select("text"), "text")
    val plan = UnigramLm.segmentCorpus(docs, "id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
