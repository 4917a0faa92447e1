package graft.operators

import graft.SparkFunSuite
import graft.functions.TextHashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece train/apply (Schuster & Nakajima 2012 / BERT): the
  * likelihood-scored argmax vs BPE's frequency argmax, `##` prefix
  * propagation through merges, and greedy longest-match inference
  * with whole-word [UNK] fallback. */
class WordPieceSpec extends SparkFunSuite {
  import spark.implicits._

  private def applyVocab(word: String, vocab: Seq[String]): String =
    TextHashKernels.wordpieceApply(
      UTF8String.fromString(word),
      new GenericArrayData(vocab.map(UTF8String.fromString).toArray)
    ).toString

  test("greedy longest-match mirrors the BERT matcher (incl. [UNK] collapse)") {
    val vocab = Seq("a", "b", "c", "##b", "##c", "ab", "##bc")
    // longest non-## token wins the first position, longest ## after
    assert(applyVocab("abc", vocab) === "ab ##c")
    assert(applyVocab("abbc", vocab) === "ab ##bc")
    assert(applyVocab("b", vocab) === "b")
    // any unmatched position collapses the WHOLE word, even after a hit
    assert(applyVocab("ax", vocab) === "[UNK]")
    assert(applyVocab("cab", vocab) === "[UNK]")
    assert(applyVocab("", vocab) === "")
    // continuation tokens never match at position 0 and vice versa
    assert(applyVocab("bc", vocab) === "b ##c")
    assert(applyVocab("ba", vocab) === "[UNK]") // no ##a in vocab
  }

  test("greedy matcher counts code points, not bytes or chars") {
    val vocab = Seq("h", "é", "##é", "##llo", "hé", "𝄞", "##𝄞")
    assert(applyVocab("héllo", vocab) === "hé ##llo")
    assert(applyVocab("𝄞𝄞", vocab) === "𝄞 ##𝄞") // astral pair = 2 cps
  }

  test("initSymbols/wpMergeOnce: ## continuation prefix propagates") {
    assert(WordPiece.initSymbols("abc").toSeq === Seq("a", "##b", "##c"))
    assert(WordPiece.initSymbols("#x").toSeq === Seq("#", "##x"))
    // a literal '#' continues as '###'; substring(2) recovers it
    assert(WordPiece.initSymbols("a#").toSeq === Seq("a", "###"))
    assert(WordPiece.wpMergeOnce(Array("a", "###"), "a", "###").toSeq ===
      Seq("a#"))
    assert(WordPiece.wpMergeOnce(Array("a", "##b", "##c"), "a", "##b").toSeq ===
      Seq("ab", "##c"))
    assert(WordPiece.wpMergeOnce(Array("##a", "##b"), "##a", "##b").toSeq ===
      Seq("##ab"))
    // left-to-right non-overlap, like BPE's mergeOnce
    assert(WordPiece.wpMergeOnce(
      Array("a", "##a", "##a"), "a", "##a").toSeq === Seq("aa", "##a"))
  }

  test("train: likelihood score picks the rare-symbol pair BPE would skip") {
    // pairs: (a,##b) count 6 but score 6/36; (x,##y) count 2, score
    // 2/4 — WordPiece merges xy FIRST, BPE would merge ab first.
    val docs = Seq((1L, "ab ab ab ab ab ab xy xy")).toDF("doc_id", "text")
    val model = WordPiece.train(docs, "text", numMerges = 2)
    assert(model.merges.map(m => (m.lhs, m.rhs, m.cPair, m.cLhs, m.cRhs)) ===
      Seq(("x", "##y", 2L, 2L, 2L), ("a", "##b", 6L, 6L, 6L)))
    assert(model.merges.map(_.merged) === Seq("xy", "ab"))
    assert(model.vocab === Seq("##b", "##y", "a", "ab", "x", "xy"))
    val bpe = Bpe.train(docs, "text", numMerges = 1)
    assert((bpe.head.lhs, bpe.head.rhs) === ("a", "b"))
  }

  test("train tie-break: equal scores pick the UTF-8-smallest (lhs, rhs)") {
    // (a,##b) and (b,##a) both count 1 with identical symbol counts.
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val m = WordPiece.train(docs, "text", numMerges = 1)
    assert((m.merges.head.lhs, m.merges.head.rhs) === ("a", "##b"))
  }

  test("tokenize: per-doc counts, [UNK] instances, fertility") {
    val train = Seq((1L, "ab ab ab ab ab ab xy xy")).toDF("doc_id", "text")
    val model = WordPiece.train(train, "text", numMerges = 2)
    val docs = Seq(
      (1L, "ab xy ab"),      // all fused: 3 words, 3 pieces
      (2L, "abb ba q ab")    // abb -> ab ##b (2); ba, q -> [UNK] (1 each)
    ).toDF("doc_id", "text")
    val out = WordPiece.tokenize(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) ===
      Array((1L, 3L, 3L, 0L), (2L, 4L, 5L, 2L)))
    assert(out.map(_.getDouble(4)) === Array(1.0, 1.25))
  }

  test("wordpiece_apply: interpreted and codegen agree (incl. nulls)") {
    val vocab = Seq("a", "b", "##b", "ab", "é", "##𝄞")
    val words = Seq("ab", "abb", "ba", "bb", "x", "é𝄞", "", "aab").toDF("w")
    graft.functions.GraftFunctions.register(spark)
    val lits = org.apache.spark.sql.functions.array(
      vocab.map(org.apache.spark.sql.functions.lit): _*)
    def run(codegen: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try words
        .select(graft.functions.GraftFunctions.wordpieceApply(
          org.apache.spark.sql.functions.col("w"), lits).as("s"))
        .collect().map(_.getString(0)).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val i = run("NO_CODEGEN")
    val c = run("CODEGEN_ONLY")
    assert(i === c)
    assert(i === words.collect().map(r => applyVocab(r.getString(0), vocab)).toSeq)
  }
}
