package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `edit_distance` — the three-unit Levenshtein kernel behind CER/WER.
 * Pins: byte mode ≡ DuckDB's byte-level `levenshtein` on the probe
 * fixtures that established its semantics; codepoint mode ≡ Spark's
 * own builtin `levenshtein` on seeded random multibyte strings (an
 * independent implementation of the same DP); token mode ≡ a naive
 * reference DP in this spec; NULL → NULL through the plan (codegen).
 */
class EditDistanceSpec extends SparkFunSuite {

  GraftFunctions.register(spark)

  private def kernel(a: String, b: String, unit: Int): Long =
    TextHashKernels.editDistance(
      UTF8String.fromString(a), UTF8String.fromString(b), unit)

  /** Independent reference: full-matrix DP over an arbitrary unit
    * sequence — no code shared with the kernel. */
  private def refDp[T](a: IndexedSeq[T], b: IndexedSeq[T]): Long = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    dp(a.length)(b.length).toLong
  }

  test("byte mode matches the DuckDB probe fixtures (byte-level semantics)") {
    // the exact probes run against DuckDB to pin its semantics:
    // levenshtein('héllo','hello')=2, ('漢字','漢')=3, ('👍a','a')=4
    assert(kernel("kitten", "sitting", TextHashKernels.UnitByte) === 3L)
    assert(kernel("héllo", "hello", TextHashKernels.UnitByte) === 2L)
    assert(kernel("漢字", "漢", TextHashKernels.UnitByte) === 3L)
    assert(kernel("👍a", "a", TextHashKernels.UnitByte) === 4L)
    assert(kernel("", "abc", TextHashKernels.UnitByte) === 3L)
    assert(kernel("a b", "ab", TextHashKernels.UnitByte) === 1L)
    assert(kernel("", "", TextHashKernels.UnitByte) === 0L)
  }

  test("codepoint mode equals Spark's builtin levenshtein on random multibyte strings") {
    val rng = new scala.util.Random(4242)
    val alphabet = Vector("a", "b", " ", "é", "漢", "👍")
    // lengths up to 150 units cross the 64-bit block boundary, so the
    // multi-block carry chain is exercised, not just the 1-word path
    def rand(): String =
      (0 until rng.nextInt(150)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString
    val rows = Seq.fill(200)((rand(), rand()))
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    val got = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
      .select(
        GraftFunctions.editDistance(col("a"), col("b"), "codepoint"),
        levenshtein(col("a"), col("b")).cast("long"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("token mode equals the reference DP over split-keeping-empties") {
    val rng = new scala.util.Random(99)
    val words = Vector("a", "bb", "ccc", "", "dd")
    // up to 120 tokens — crosses the 64-row block boundary
    def rand(): String =
      (0 until rng.nextInt(120)).map(_ =>
        words(rng.nextInt(words.length))).mkString(" ")
    for (_ <- 0 until 200) {
      val (a, b) = (rand(), rand())
      val want = refDp(a.split(" ", -1).toIndexedSeq, b.split(" ", -1).toIndexedSeq)
      assert(kernel(a, b, TextHashKernels.UnitToken) === want, s"a=[$a] b=[$b]")
    }
    // single-space-convention pins: "" has ONE empty token
    assert(kernel("", "", TextHashKernels.UnitToken) === 0L)
    assert(kernel("", "x", TextHashKernels.UnitToken) === 1L)
    assert(kernel("a  b", "a b", TextHashKernels.UnitToken) === 1L)
  }

  test("byte mode equals the reference DP and the builtin on long ASCII strings") {
    val rng = new scala.util.Random(7)
    def rand(): String =
      (0 until rng.nextInt(300)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    for (_ <- 0 until 150) {
      val (a, b) = (rand(), rand())
      // ASCII: byte units == code points, so the builtin agrees too
      val want = refDp(a.getBytes("UTF-8").toIndexedSeq, b.getBytes("UTF-8").toIndexedSeq)
      assert(kernel(a, b, TextHashKernels.UnitByte) === want, s"a=[$a] b=[$b]")
    }
  }

  test("damerau: DuckDB probe fixtures (true Damerau, byte-level)") {
    def dam(a: String, b: String): Long =
      TextHashKernels.damerauDistance(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // the exact probes run against DuckDB's damerau_levenshtein
    assert(dam("ab", "ba") === 1L)
    assert(dam("ca", "abc") === 2L)    // TRUE Damerau (OSA would say 3)
    assert(dam("héllo", "hello") === 2L)
    assert(dam("abcd", "acbd") === 1L)
    assert(dam("kitten", "sitting") === 3L)
    assert(dam("xy", "yxz") === 2L)
    assert(dam("", "abc") === 3L)
    intercept[IllegalArgumentException] { dam("x" * 513, "y") }
  }

  test("damerau equals BFS shortest-edit-path on small strings") {
    // independent reference: true Damerau IS the shortest path in the
    // string-rewrite graph with insert/delete/substitute/transpose-
    // adjacent ops — BFS over strings bounded to length 6, alphabet ab
    def bfs(src: String, dst: String): Long = {
      if (src == dst) return 0L
      val maxLen = math.max(src.length, dst.length) + 1
      val seen = scala.collection.mutable.Set(src)
      var frontier = List(src)
      var dist = 0L
      while (true) {
        dist += 1
        val next = scala.collection.mutable.ListBuffer.empty[String]
        for (s <- frontier) {
          val moves = scala.collection.mutable.ListBuffer.empty[String]
          for (i <- 0 to s.length; c <- "ab")
            moves += s.substring(0, i) + c + s.substring(i) // insert
          for (i <- s.indices) {
            moves += s.substring(0, i) + s.substring(i + 1) // delete
            for (c <- "ab")
              moves += s.substring(0, i) + c + s.substring(i + 1) // sub
          }
          for (i <- 0 until s.length - 1) // transpose adjacent
            moves += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
          for (t <- moves if t.length <= maxLen && !seen.contains(t)) {
            if (t == dst) return dist
            seen += t
            next += t
          }
        }
        frontier = next.toList
        if (frontier.isEmpty) return Long.MaxValue
      }
      dist
    }
    val rng = new scala.util.Random(11)
    def rand(): String =
      (0 until rng.nextInt(5)).map(_ => ('a' + rng.nextInt(2)).toChar).mkString
    for (_ <- 0 until 60) {
      val (a, b) = (rand(), rand())
      assert(TextHashKernels.damerauDistance(
        UTF8String.fromString(a), UTF8String.fromString(b)) === bfs(a, b),
        s"a=[$a] b=[$b]")
    }
  }

  test("NULL propagates through the plan; bad unit rejected") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, "x"), Row("x", null))), schema)
    val got = df.select(
      GraftFunctions.editDistance(col("a"), col("b"), "byte")).collect()
    assert(got.forall(_.isNullAt(0)))
    intercept[Exception] {
      df.select(GraftFunctions.editDistance(col("a"), col("b"), "word")).collect()
    }
  }

  test("editErrorRate: CER and WER hand fixtures") {
    import graft.operators.GenEval
    import spark.implicits._
    val pairs = Seq(
      (1L, "kitten", "sitting"),  // dist 3, gold 7 bytes
      (2L, "", ""),               // empty gold, empty pred → 0
      (3L, "x", ""))              // empty gold, non-empty pred → 1e6
      .toDF("id", "pred", "gold")
    val cer = GenEval.editErrorRate(pairs, "id", "pred", "gold", "byte")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cer(1L) === ((3L, 7L, 428571L)))
    assert(cer(2L) === ((0L, 0L, 0L)))
    assert(cer(3L) === ((1L, 0L, 1000000L)))
    val wp = Seq((1L, "the cat sat", "the cat sat down"),  // dist 1, gold 4
      (2L, "a b", "b a")).toDF("id", "pred", "gold")       // dist 2, gold 2
    val wer = GenEval.editErrorRate(wp, "id", "pred", "gold", "token")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(wer(1L) === ((1L, 4L, 250000L)))
    assert(wer(2L) === ((2L, 2L, 1000000L)))
  }
}
