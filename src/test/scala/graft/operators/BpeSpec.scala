package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFunSuite
import graft.functions.TextHashKernels
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** BPE train/apply (Sennrich 2016): hand-computed merges on the paper's
  * low/lower/newest corpus, kernel totality, and the concatenation
  * invariant (subwords re-join to the word for every input). */
class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  private def applyMerges(word: String, merges: Seq[String]): String =
    TextHashKernels.bpeApply(
      UTF8String.fromString(word),
      new GenericArrayData(merges.map(m => UTF8String.fromString(m)).toArray)
    ).toString

  test("train reproduces the classic low/lower/newest merges") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    assert(merges.map(m => (m.lhs, m.rhs, m.freq)) === Seq(
      ("l", "o", 6L), ("lo", "w", 6L), ("e", "w", 3L),
      ("n", "ew", 3L), ("e", "r", 2L), ("e", "s", 2L)))
    assert(merges.map(_.rank) === (1 to 6))
  }

  test("tie-break: equal counts pick the UTF-8-smallest (lhs, rhs)") {
    // "ab" and "ba" pairs both occur once; (a,b) < (b,a).
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 1)
    assert((m.head.lhs, m.head.rhs) === ("a", "b"))
  }

  test("apply: greedy left-to-right non-overlap matches the paper") {
    // (a,a) on "aaaa" merges positions (0,1) and (2,3), not (1,2).
    assert(applyMerges("aaaa", Seq("a a")) === "aa aa")
    assert(applyMerges("aaa", Seq("a a")) === "aa a")
    // Later merges see earlier output: a+a -> aa, then aa+aa -> aaaa.
    assert(applyMerges("aaaa", Seq("a a", "aa aa")) === "aaaa")
    // A pair must match whole symbols, not prefixes: (a,b) on [a, bc]
    // does not fire.
    assert(applyMerges("abc", Seq("b c", "a x")) === "a bc")
  }

  test("train/apply round-trip incl. open-vocabulary words") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val ms = Bpe.mergeStrings(merges)
    assert(applyMerges("lowest", ms) === "low es t")
    assert(applyMerges("newer", ms) === "new er")
    // A word never seen in training still segments (open vocabulary).
    assert(applyMerges("slower", ms) === "s low er")
  }

  test("tokenize: per-doc counts and fertility") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val out = Bpe.tokenize(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      Array((1L, 5L, 8L), (2L, 4L, 7L)))
    assert(out.map(_.getDouble(3)) === Array(1.6, 1.75))
  }

  test("vocab: learned subwords weighted by training word counts") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val v = Bpe.vocab(docs, "text", merges).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(v("low") === 6L)
    assert(v("new") === 3L)
    assert(v("er") === 2L)
  }

  test("kernel totality: concat invariant under fuzz incl. surrogates") {
    val rnd = new scala.util.Random(42)
    val merges = Seq("a b", "ab c", "é é", "😀 a", "bad", " x", "x ")
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(12)
      val word = (1 to len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => "a"; case 1 => "b"; case 2 => "c"
          case 3 => "é"      // BMP non-ASCII
          case _ => "😀" // surrogate pair (U+1F600)
        }
      }.mkString
      if (word.nonEmpty) {
        val seg = applyMerges(word, merges)
        assert(seg.replace(" ", "") === word, s"concat invariant broke for '$word'")
      }
    }
    // Degenerate merges (no space / leading / trailing) are ignored, not fatal.
    assert(applyMerges("abc", Seq("bad")) === "a b c")
  }

  test("splitCodepoints splits codepoints, not UTF-16 units") {
    assert(TextHashKernels.splitCodepoints("a😀b").toSeq ===
      Seq("a", "😀", "b"))
  }
}
