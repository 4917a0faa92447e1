package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class DataSelectionSpec extends SparkFunSuite {

  import spark.implicits._

  // target speaks "wiki words", raw pool is a mix: docs made of target
  // vocabulary must outscore docs of raw-only vocabulary
  private def corpus = {
    val target = (1L to 40L).map(i =>
      (i, "article reference citation neutral " + s"t$i", true))
    val rawLikeTarget = (101L to 110L).map(i =>
      (i, "article reference citation neutral prose", false))
    val rawJunk = (201L to 210L).map(i =>
      (i, "click buy cheap pills now casino", false))
    (target ++ rawLikeTarget ++ rawJunk).toDF("id", "text", "tgt")
  }

  test("dsirWeights: target-like raw docs outscore junk; targets excluded") {
    val rows = DataSelection.dsirWeights(corpus, "id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.keySet === ((101L to 110L) ++ (201L to 210L)).toSet)
    val likeMin = (101L to 110L).map(rows).min
    val junkMax = (201L to 210L).map(rows).max
    assert(likeMin > junkMax,
      s"target-like min $likeMin must exceed junk max $junkMax")
  }

  test("dsirWeights: deterministic across partitionings") {
    val a = DataSelection.dsirWeights(corpus.repartition(1), "id", "text",
      col("tgt")).orderBy("id").collect().toSeq
    val b = DataSelection.dsirWeights(corpus.repartition(13), "id", "text",
      col("tgt")).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("dsirSelect: k rows in weight-then-id order") {
    val rows = DataSelection.dsirSelect(corpus, "id", "text", col("tgt"),
      k = 5).collect()
    assert(rows.length === 5)
    val keys = rows.map(r => (-r.getDouble(2), r.getLong(0)))
    assert(keys.sortBy(identity).toSeq === keys.toSeq)
    // the five best must all be target-like, not junk
    rows.foreach(r => assert(r.getLong(0) <= 110L, r.toString))
  }

  test("dsirWeights: bucket count must divide 16^4") {
    val ex = intercept[IllegalArgumentException] {
      DataSelection.dsirWeights(corpus, "id", "text", col("tgt"),
        buckets = 1000)
    }
    assert(ex.getMessage.contains("divide"))
  }

  test("dsirWeights: n_ngrams = unigrams + bigrams") {
    val one = Seq((1L, "a b c", false), (2L, "a b c", true))
      .toDF("id", "text", "tgt")
    val r = DataSelection.dsirWeights(one, "id", "text", col("tgt"))
      .collect().head
    assert(r.getLong(1) === 5L) // 3 unigrams + 2 bigrams
  }

  test("hashed_ngram_buckets kernel ≡ the split/transform HOF formulation") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // tokenization edge cases: empty string (one empty token), interior
    // multi-space (empty tokens kept), trailing spaces (dropped),
    // all-spaces (no tokens at all), multibyte, equal-token runs
    val fixtures = Seq("", " ", "  ", "a", "a b", "a  b", "a b ", "a b  ",
      " a", "héllo wörld 日本 語", "x x x x", "one two three four five")
    val df = fixtures.toDF("text")
    val toks = split(col("text"), " ")
    val bis = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array())
    val hof = df.select(col("text"),
      transform(concat(toks, bis), ng =>
        (SeededHash.md5Nibbles(ng, 4) % 1024).cast("int")).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap
    val kernel = df.select(col("text"),
      GraftFunctions.hashedNgramBuckets(col("text"), 1024).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap
    fixtures.foreach { s =>
      assert(kernel(s) === hof(s), s"text '$s'")
    }
    // interpreted ≡ codegen: the same values via the kernel directly
    fixtures.foreach { s =>
      val direct = graft.functions.TextHashKernels.hashedNgramBuckets(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 1024)
        .toIntArray().toSeq
      assert(direct === kernel(s), s"direct kernel for '$s'")
    }
  }

  test("dsirWeights plan: lambda join broadcast, no cartesian on facts") {
    val plan = DataSelection.dsirWeights(corpus, "id", "text", col("tgt"))
      .queryExecution.executedPlan.toString
    // the B-row lambda table joins as a broadcast hash join; the only
    // nested-loop is the documented 1-row normalizer crossJoin
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
