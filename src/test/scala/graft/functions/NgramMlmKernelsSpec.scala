package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.SparkFunSuite
import graft.operators.SeededHash

/**
 * Pins the two round-14 codegen kernels to the higher-order-function
 * formulations they replaced (the judge's kernel ≡ HOF discipline):
 * `ngram_strings` vs the `transform(sequence(...))` pipeline and
 * `mlm_mask` vs the `transform`/`zip_with`/`aggregate` tree — byte
 * identical on a corpus that hits every tokenization edge (empty
 * string, single token, interior/leading/trailing spaces → empty
 * tokens, unicode, NULLs) plus seeded-random token soup.
 */
class NgramMlmKernelsSpec extends SparkFunSuite {
  import spark.implicits._

  GraftFunctions.register(spark)

  /** Edge corpus + 200 seeded-random docs over a tiny alphabet so
    * consecutive spaces / repeats / empty tokens occur often. */
  private lazy val corpus: Seq[(Long, Option[String])] = {
    val edges = Seq(
      Some(""), Some(" "), Some("  "), Some("a"), Some("a b"),
      Some(" a"), Some("a "), Some("a  b"), Some("  a b  c "),
      Some("δ λ δ λ"), Some("a b c d e f g h"), None,
      Some("x" * 50), Some(("tok " * 40).trim))
    val rnd = new scala.util.Random(14L)
    val alpha = Vector("a", "bb", "λδ", "", "c")
    val random = (1 to 200).map { _ =>
      val n = rnd.nextInt(12)
      Some((1 to n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" "))
    }
    (edges ++ random).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private lazy val docs =
    corpus.toDF("doc_id", "text").repartition(3).cache()

  /** The replaced HOF n-gram pipeline, verbatim. */
  private def hofNgrams(textCol: String, n: Int): Column = expr(
    s"CASE WHEN size(split($textCol, ' ')) >= $n THEN " +
      s"transform(sequence(1, size(split($textCol, ' ')) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(split($textCol, ' '), i, $n))) " +
      "ELSE array() END")

  test("ngram_strings == transform(sequence(...)) HOF for n = 1..6") {
    for (n <- 1 to 6) {
      val got = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          GraftFunctions.ngramStrings(col("text"), n).as("g"),
          hofNgrams("text", n).as("h"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("ngram_strings: NULL text -> NULL; empty string -> one empty unigram") {
    val r = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("id", "t")
      .select(col("id"), GraftFunctions.ngramStrings(col("t"), 1).as("g"),
        GraftFunctions.ngramStrings(col("t"), 2).as("g2"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(r(1).getSeq[String](1) === Seq(""))
    assert(r(1).getSeq[String](2) === Seq.empty)
  }

  /** The replaced three-HOF MLM tree, verbatim (posHash inline). */
  private def hofMlm(idCol: String, textCol: String, oneIn: Int) = {
    def posHash(id: Column, pos: Column) =
      SeededHash.md5Nibbles(
        concat(id.cast("string"), lit(":"), pos.cast("string")), 4)
    val toks = split(col(textCol), " ")
    val idxs = sequence(lit(1), size(toks))
    val flags = transform(idxs, p => posHash(col(idCol), p) % oneIn === 0)
    val masked = zip_with(toks, flags, (t, f) =>
      when(f, lit("[MASK]")).otherwise(t))
    val targets = zip_with(toks, flags, (t, f) => when(f, t))
    Seq(
      size(toks).cast("long").as("n_tokens"),
      aggregate(flags, lit(0L), (acc, f) =>
        acc + when(f, 1L).otherwise(0L)).as("n_masked"),
      concat_ws(" ", masked).as("input_text"),
      concat_ws(" ", filter(targets, t => t.isNotNull)).as("target_text"))
  }

  test("mlm_mask == transform/zip_with/aggregate HOF tree (oneIn 2, 3, 7)") {
    for (oneIn <- Seq(2, 3, 7)) {
      val k = docs.select(col("doc_id"),
        GraftFunctions.mlmMask(col("doc_id").cast("string"), col("text"),
          oneIn).as("m"))
        .select(col("doc_id"), col("m.n_tokens"), col("m.n_masked"),
          col("m.input_text"), col("m.target_text"))
        .orderBy("doc_id").collect()
      val h = docs.select(col("doc_id") +: hofMlm("doc_id", "text", oneIn): _*)
        .orderBy("doc_id").collect()
      assert(k.length === h.length)
      k.zip(h).foreach { case (a, b) =>
        assert(a === b, s"oneIn=$oneIn doc=${a.getLong(0)}")
      }
    }
  }

  test("mlm_mask NULL degradation matches the HOF tree field-wise") {
    val weird = Seq(
      (Some("1"), Some("a b c d e f g h i j")),
      (Some("2"), None),                   // text NULL
      (None: Option[String], Some("a b")), // id NULL
      (Some("3"), Some("")),
      (None, None))
      .toDF("id", "t")
    val k = weird.select(col("id"),
      GraftFunctions.mlmMask(col("id").cast("string"), col("t"), 2).as("m"))
      .select(col("id"), col("m.n_tokens"), col("m.n_masked"),
        col("m.input_text"), col("m.target_text"))
      .collect()
    val h = weird.select(col("id") +: hofMlm("id", "t", 2): _*).collect()
    k.zip(h).foreach { case (a, b) => assert(a === b) }
    // text NULL: counts NULL, both strings empty — never a NULL struct
    val tn = k.find(r => !r.isNullAt(0) && r.getString(0) == "2").get
    assert(tn.isNullAt(1) && tn.isNullAt(2))
    assert(tn.getString(3) === "" && tn.getString(4) === "")
  }

  test("masked rate is plausible and deterministic across partitionings") {
    val a = docs.filter(col("text").isNotNull).select(
      GraftFunctions.mlmMask(col("doc_id").cast("string"), col("text"), 7)
        .as("m")).agg(sum("m.n_masked"), sum("m.n_tokens")).head()
    val b = docs.filter(col("text").isNotNull).repartition(7).select(
      GraftFunctions.mlmMask(col("doc_id").cast("string"), col("text"), 7)
        .as("m")).agg(sum("m.n_masked"), sum("m.n_tokens")).head()
    assert(a === b)
    val (m, t) = (a.getLong(0).toDouble, a.getLong(1).toDouble)
    assert(m / t > 0.05 && m / t < 0.25, s"rate ${m / t}")
  }
}

/**
 * Plan-shape guards for the kernelized rows: the kernel call appears
 * exactly once per order, inside whole-stage codegen (`*(n)` span),
 * and none of the replaced CodegenFallback HOFs survive in the plan.
 */
class NgramMlmPlanSpec extends SparkFunSuite {

  GraftFunctions.register(spark)

  // parquet-backed input: a LocalRelation would be constant-folded
  // away (ConvertToLocalRelation) and show no plan at all
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  /** Execute, then read the AQE-final physical plan. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("distinctN plan: ngram_strings kernel in codegen, no transform/sequence HOF") {
    val plan = finalPlan(
      graft.operators.GenEval.distinctN(docs, "text", maxN = 2))
    assert(plan.contains("ngram_strings"), plan)
    assert(!plan.contains("transform("), plan)
    assert(!plan.contains("sequence("), plan)
    assert(plan.contains("*("), plan) // WholeStageCodegen span
  }

  test("mlmCorruption plan: ONE mlm_mask call in codegen, no zip_with/aggregate HOFs") {
    val plan = finalPlan(
      graft.operators.ObjectivePrep.mlmCorruption(docs, "doc_id", "text"))
    val calls = "mlm_mask".r.findAllIn(plan).length
    assert(calls == 1, s"mlm_mask appears $calls times (CollapseProject duplicated the kernel?)\n$plan")
    assert(!plan.contains("zip_with"), plan)
    assert(!plan.contains("aggregate("), plan)
    assert(plan.contains("*("), plan)
  }
}
