package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `ngram_overlap_counts` — the scan-local clipped n-gram overlap
 * kernel behind the generation-eval metrics. Pins three contracts:
 *
 *  1. kernel ≡ an independent Scala reference implementing the SQL
 *     semantics the pre-kernel plans used (`split(s, ' ')` keeping
 *     empties at token level; code points of the space-stripped
 *     string at char level) on seeded-random strings including
 *     multibyte UTF-8, empties, and space runs;
 *  2. interpreted eval ≡ the codegen path through a DataFrame (both
 *     call the same static kernel, but the null plumbing differs);
 *  3. a NULL side contributes zero units on that side while the
 *     other side still counts — and the output itself is never null.
 */
class NgramOverlapSpec extends SparkFunSuite {

  GraftFunctions.register(spark)

  /** Independent reference: the exact semantics of the old HOF
    * formulation (SQL split / substring windows + per-gram clipped
    * min), written against java.lang.String — no Spark code shared
    * with the kernel. */
  private def ref(pred: String, gold: String,
      maxN: Int, charLevel: Boolean): Seq[Long] = {
    def units(s: String): Vector[String] =
      if (s == null) Vector.empty
      else if (charLevel) {
        val t = s.replace(" ", "")
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          out += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        out.result()
      } else s.split(" ", -1).toVector
    val pu = units(pred)
    val gu = units(gold)
    (1 to maxN).flatMap { n =>
      def grams(u: Vector[String]): Vector[String] =
        if (u.length < n) Vector.empty
        else u.sliding(n).map(_.mkString(if (charLevel) "" else " ")).toVector
      val pg = grams(pu)
      val gg = grams(gu)
      val left = scala.collection.mutable.Map.empty[String, Int]
      gg.foreach(g => left(g) = left.getOrElse(g, 0) + 1)
      var ov = 0L
      pg.foreach { g =>
        val c = left.getOrElse(g, 0)
        if (c > 0) { left(g) = c - 1; ov += 1L }
      }
      Seq(ov, pg.length.toLong, gg.length.toLong)
    }
  }

  private def kernel(pred: String, gold: String,
      maxN: Int, charLevel: Boolean): Seq[Long] =
    TextHashKernels.ngramOverlapCounts(
      if (pred == null) null else UTF8String.fromString(pred),
      if (gold == null) null else UTF8String.fromString(gold),
      maxN, charLevel).toLongArray().toSeq

  private val edges: Seq[(String, String)] = Seq(
    ("", ""), ("", "a"), ("a", ""), (null, "a b"), ("a b", null),
    (null, null), ("a  b", "a b"), (" a b ", "a b"),
    ("a a a", "a a"), ("héllo wörld", "héllo world"),
    ("漢字 テスト", "漢字テスト"), ("👍👍 x", "👍 x"),
    ("a b c d e", "e d c b a"), ("ab", "ba"), ("a", "a b c d e f"))

  test("kernel matches the independent reference on edge fixtures") {
    for ((p, g) <- edges; charLevel <- Seq(true, false);
         maxN <- Seq(1, 2, 4, 6)) {
      assert(kernel(p, g, maxN, charLevel) === ref(p, g, maxN, charLevel),
        s"pred=$p gold=$g maxN=$maxN char=$charLevel")
    }
  }

  test("kernel matches the reference on seeded random strings") {
    val rng = new scala.util.Random(1234)
    val alphabet = Vector("a", "b", "c", " ", " ", "é", "漢", "👍", "ab ")
    def rand(): String =
      (0 until rng.nextInt(40)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 300) {
      val p = if (rng.nextInt(20) == 0) null else rand()
      val g = if (rng.nextInt(20) == 0) null else rand()
      val charLevel = rng.nextBoolean()
      val maxN = 1 + rng.nextInt(6)
      assert(kernel(p, g, maxN, charLevel) === ref(p, g, maxN, charLevel),
        s"pred=$p gold=$g maxN=$maxN char=$charLevel")
    }
  }

  test("codegen path through a DataFrame matches interpreted eval") {
    val rng = new scala.util.Random(77)
    val alphabet = Vector("x", "y", " ", "é", "👍")
    def rand(): String =
      (0 until rng.nextInt(25)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString
    val rows = edges ++ Seq.fill(100)((
      if (rng.nextInt(10) == 0) null else rand(),
      if (rng.nextInt(10) == 0) null else rand()))
    val schema = StructType(Seq(
      StructField("p", StringType), StructField("g", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
    for (charLevel <- Seq(true, false)) {
      // codegen: through the registered function in a projection
      val got = df.select(
        GraftFunctions.ngramOverlapCounts(col("p"), col("g"), 4, charLevel))
        .collect().map(_.getSeq[Long](0))
      // interpreted: Expression.eval on literals (no codegen involved)
      rows.zip(got).foreach { case ((p, g), viaDf) =>
        val interp = NgramOverlapCountsExpr(
          Literal(if (p == null) null else UTF8String.fromString(p), StringType),
          Literal(if (g == null) null else UTF8String.fromString(g), StringType),
          4, charLevel).eval(InternalRow.empty)
        assert(viaDf === interp.asInstanceOf[ArrayData].toLongArray().toSeq,
          s"pred=$p gold=$g char=$charLevel")
      }
    }
  }

  test("output is non-null even for all-null inputs; maxN guarded") {
    assert(kernel(null, null, 2, true) === Seq(0L, 0L, 0L, 0L, 0L, 0L))
    intercept[IllegalArgumentException] {
      TextHashKernels.ngramOverlapCounts(
        UTF8String.fromString("a"), UTF8String.fromString("a"), 0, true)
    }
    intercept[IllegalArgumentException] {
      TextHashKernels.ngramOverlapCounts(
        UTF8String.fromString("a"), UTF8String.fromString("a"), -3, false)
    }
  }

  test("gen-eval driver plans have no explode and no join") {
    // the r10/r11 scale-killer: chrF used to explode every char
    // position × order into a string-keyed shuffle + full-outer join;
    // the kernel rewrite must keep all three plans scan-local
    for (q <- Seq("eval_chrf", "eval_chrfpp", "eval_bleu4",
        "eval_token_f1", "eval_rouge2", "eval_sentence_bleu",
        "eval_cer", "eval_wer")) {
      val plan = graft.SparkEntry.queries(q)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"), s"$q:\n$plan")
      assert(!plan.contains("Join"), s"$q:\n$plan")
    }
  }
}
