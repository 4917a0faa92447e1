package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextHashKernels}

/**
 * WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
 * tokenizer) — the likelihood-scored sibling of [[Bpe]]: training
 * merges the adjacent symbol pair maximizing
 *
 *   score(l, r) = count(l r) / (count(l) · count(r))
 *
 * (the pair whose fusion most increases a unigram LM's corpus
 * likelihood), where [[Bpe]] merges the raw-frequency argmax.
 * Continuation symbols carry the `##` prefix from initialization
 * through every merge (`a + ##b → ab`, `##a + ##b → ##ab`), and
 * INFERENCE is not merge replay but greedy longest-match against the
 * final vocabulary, with whole-word `[UNK]` fallback — the other
 * structural difference from BPE, and why a trained WordPiece vocab
 * is order-free.
 *
 * Shape (same scale story as [[Bpe]]): word counting is the only
 * full-corpus pass; the merge loop runs on the driver over the
 * top-[[Bpe.TopWords]] word relation (bounded state); application
 * segments the DISTINCT-words relation through the codegen
 * `wordpiece_apply` kernel and joins back — the zipfian corpus pays
 * greedy matching once per word TYPE.
 *
 * Determinism contract (engine-reproducible bit-for-bit): pair and
 * symbol counts are exact integers; the score is the IEEE double
 * `c / (c_l · c_r)` with both factors cast to double first (no
 * integer overflow at any corpus size); ties break to the
 * lexicographically smallest (lhs, rhs) in UTF-8 byte order — Spark's
 * and DuckDB's shared collation. The oracle replays the whole loop as
 * unrolled CTEs with the identical ORDER BY.
 */
object WordPiece {

  /** Merge rounds — fixed so the generated SQL oracle unrolls to the
    * same depth. */
  val MergeRounds = 16

  /** One trained merge with its exact evidence: the pair count and
    * both symbol counts that formed the winning score. */
  case class Merge(rank: Int, lhs: String, rhs: String,
      cPair: Long, cLhs: Long, cRhs: Long) {
    require(rhs.startsWith("##") && rhs.length > 2,
      s"WordPiece right side must be a ##-continuation, got '$rhs'")
    /** `a + ##b → ab`; `##a + ##b → ##ab` — the left side keeps its
      * word-position prefix, the right side always sheds `##`. */
    def merged: String = lhs + rhs.substring(2)
  }

  /** A trained model: rank-ordered merges plus the inference
    * vocabulary (initial alphabet of the training words ∪ merged
    * tokens), UTF-8-sorted for a stable literal. */
  case class Model(merges: Seq[Merge], vocab: Seq[String])

  /** Initial segmentation: code points, all but the first carrying
    * the `##` continuation prefix. */
  def initSymbols(word: String): Array[String] = {
    val cps = TextHashKernels.splitCodepoints(word)
    var i = 1
    while (i < cps.length) { cps(i) = "##" + cps(i); i += 1 }
    cps
  }

  /** One left-to-right merge pass — [[TextHashKernels.mergeOnce]]
    * semantics (and the oracle's list_reduce fold) with the WordPiece
    * concatenation rule. */
  def wpMergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val merged = l + r.substring(2)
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += merged; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8)) < 0

  /**
   * Train `numMerges` likelihood-scored merges on the
   * top-`topWords` word relation and assemble the inference vocab.
   * Driver-side loop over ≤ `topWords` collected rows; the
   * distributed part is the one word-count aggregate.
   */
  def train(
      docs: DataFrame, textCol: String,
      numMerges: Int = MergeRounds, topWords: Int = Bpe.TopWords): Model = {
    val top = Bpe.wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topWords)
      .collect()
    var words: Array[(Array[String], Long)] =
      top.map(r => (initSymbols(r.getString(0)), r.getLong(1)))
    val alphabet = mutable.SortedSet.empty[String](Ordering.fromLessThan(utf8Lt))
    words.foreach { case (syms, _) => alphabet ++= syms }
    val out = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      val sc = mutable.HashMap.empty[String, Long]
      var w = 0
      while (w < words.length) {
        val (syms, c) = words(w)
        var j = 0
        while (j < syms.length) {
          sc.update(syms(j), sc.getOrElse(syms(j), 0L) + c)
          if (j < syms.length - 1) {
            val key = (syms(j), syms(j + 1))
            pc.update(key, pc.getOrElse(key, 0L) + c)
          }
          j += 1
        }
        w += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        // mirrors the oracle's ORDER BY CAST(c AS DOUBLE) /
        // (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE)) DESC, l, r LIMIT 1
        var bl: String = null; var br: String = null
        var bc = 0L; var bcl = 0L; var bcr = 0L; var bs = -1.0
        pc.foreach { case ((l, r), c) =>
          val cl = sc(l); val cr = sc(r)
          val s = c.toDouble / (cl.toDouble * cr.toDouble)
          val wins =
            bl == null || s > bs ||
              (s == bs && (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))
          if (wins) { bl = l; br = r; bc = c; bcl = cl; bcr = cr; bs = s }
        }
        out += Merge(k + 1, bl, br, bc, bcl, bcr)
        words = words.map { case (syms, c) => (wpMergeOnce(syms, bl, br), c) }
        k += 1
      }
    }
    val merges = out.result()
    val vocab = (alphabet ++ merges.map(_.merged)).toSeq
    Model(merges, vocab)
  }

  /** The trained merge table (the model-card driver row): every count
    * exact; the score is derivable, so it is not re-emitted in float. */
  def fitTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.cPair, m.cLhs, m.cRhs))
      .toDF("rank", "lhs", "rhs", "merged", "c_pair", "c_lhs", "c_rhs")
  }

  /**
   * Per-document subword statistics under a trained vocab: greedy
   * longest-match per DISTINCT word (codegen `wordpiece_apply`), then
   * the per-word piece count joins back to the token stream. `n_unk`
   * counts word INSTANCES that fell to `[UNK]`; `fertility` is
   * subwords per word.
   */
  def tokenize(
      docs: DataFrame, idCol: String, textCol: String, model: Model,
      scale: Int = 6): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val lits = array(model.vocab.map(lit): _*)
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
    val seg = toks.select("word").distinct()
      .select(col("word"),
        GraftFunctions.wordpieceApply(col("word"), lits).as("seg"))
      .select(col("word"),
        size(split(col("seg"), " ")).cast("long").as("nsub"),
        (col("seg") === "[UNK]").as("unk"))
    toks.join(seg, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("nsub")).as("n_subwords"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk"))
      .select(col(idCol), col("n_words"), col("n_subwords"), col("n_unk"),
        round(col("n_subwords").cast("double") / col("n_words"), scale)
          .as("fertility"))
  }
}
