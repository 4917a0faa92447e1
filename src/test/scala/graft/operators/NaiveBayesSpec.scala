package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Multinomial NB: hand-computed smoothed likelihoods, deterministic
  * vocab truncation, OOV-only prior fallback with smaller-class tie
  * break, and partition invariance. */
class NaiveBayesSpec extends SparkFunSuite {
  import spark.implicits._

  private val train = Seq(
    (1L, "a", "cat sat mat"),
    (2L, "a", "cat cat"),
    (3L, "b", "dog ran"),
    (4L, "b", "dog dog barks")).toDF("id", "cls", "text")

  test("hand-computed Laplace-smoothed log-likelihoods on the 6-dp micro grid") {
    val m = NaiveBayes.fit(train, "cls", "text", vocabSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // vocab = 6 tokens; class a: cat 3, sat 1, mat 1 (tot 5);
    // loglik(a, cat) = (round(log10 4) − round(log10 11)) µ = −439333
    assert(m(("a", "cat")) === (3L, -439333L))
    assert(m(("a", "sat")) === (1L, (math.round(math.log10(2) * 1e6) -
      math.round(math.log10(11) * 1e6))))
    // zero-count smoothing row exists: log10(1/11)
    assert(m(("a", "dog")) === (3L - 3L, -1041393L))
    assert(m.size === 12) // 2 classes × 6 vocab tokens
  }

  test("vocabulary truncation is top-N by count with token tie-break") {
    val m = NaiveBayes.fit(train, "cls", "text", vocabSize = 2)
    // cat(3) and dog(3) beat all count-1 tokens; V = 2 in the denominator
    val toks = m.select("token").distinct().as[String].collect().sorted.toSeq
    assert(toks === Seq("cat", "dog"))
    val row = m.filter("cls = 'a' AND token = 'cat'").collect()(0)
    // a's vocab-token total = 3 (cat only) → log10(4/(3+2))
    assert(row.getLong(3) ===
      math.round(math.log10(4) * 1e6) - math.round(math.log10(5) * 1e6))
  }

  test("MAP prediction: likelihoods dominate, OOV-only docs fall back to priors") {
    val model = NaiveBayes.fit(train, "cls", "text", vocabSize = 10)
    val pri = NaiveBayes.priors(train, "cls", "text")
    val test = Seq(
      (10L, "b", "cat sat"),  // token evidence says a
      (11L, "a", "dog barks"), // token evidence says b
      (12L, "b", "zzz qqq")    // all OOV → equal priors → tie → 'a'
    ).toDF("id", "cls", "text")
    val out = NaiveBayes.predict(test, "id", "cls", "text", model, pri)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(out === Seq((10L, "b", "a"), (11L, "a", "b"), (12L, "b", "a")))
  }

  test("confusion card counts (actual, predicted) pairs") {
    val model = NaiveBayes.fit(train, "cls", "text", vocabSize = 10)
    val pri = NaiveBayes.priors(train, "cls", "text")
    val pred = NaiveBayes.predict(train, "id", "cls", "text", model, pri)
    val conf = NaiveBayes.confusion(pred)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // training docs classify back to their own class on this fixture
    assert(conf === Seq(("a", "a", 2L), ("b", "b", 2L)))
  }

  test("featureLogOdds: hand-computed Haldane log-odds, tie to smaller token") {
    val docs = Seq(
      (1L, "a", "cat sat"), (2L, "a", "cat"),
      (3L, "b", "dog"), (4L, "b", "dog cat")).toDF("id", "cls", "text")
    val got = NaiveBayes.featureLogOdds(docs, "id", "cls", "text",
      vocabSize = 10, topPerClass = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // (a, cat): a=2 b=0 c=1 d=1 → log10(5·3) − log10(1·3) = 698970 µ;
    // (a, sat) ties at 698970 → token order; (a, dog) = −1397940.
    assert(got === Seq(
      ("a", "cat", 2L, 698970L, 1L),
      ("a", "sat", 1L, 698970L, 2L),
      ("a", "dog", 0L, -1397940L, 3L),
      ("b", "dog", 2L, 1397940L, 1L),
      ("b", "cat", 1L, -698970L, 2L),
      ("b", "sat", 0L, -698970L, 3L)))
  }

  test("property: fit and MAP predictions match an in-memory reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCorpus = for {
      nDocs <- Gen.chooseNum(2, 12)
      docs <- Gen.listOfN(nDocs, for {
        cls <- Gen.oneOf("c0", "c1", "c2")
        toks <- Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
          .map(_.take(6))
      } yield (cls, toks.mkString(" ")))
      vs <- Gen.chooseNum(2, 6)
    } yield (docs.zipWithIndex.map { case ((c, t), i) => (i.toLong, c, t) }, vs)
    def microLog(x: Double): Long = math.round(math.log10(x) * 1e6)
    val prop = Prop.forAll(genCorpus) { case (docs, vocabSize) =>
      val df = docs.toDF("id", "cls", "text").repartition(3)
      // reference model
      val toks = docs.flatMap { case (_, c, t) =>
        t.split(" ").filter(_.nonEmpty).map(c -> _) }
      val vocab = toks.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(vocabSize).map(_._1)
      val v = vocab.size
      val classes = toks.map(_._1).distinct
      val wantModel = (for {
        c <- classes; t <- vocab
      } yield {
        val cnt = toks.count(p => p._1 == c && p._2 == t).toLong
        val tot = toks.count(p => p._1 == c && vocab.contains(p._2)).toLong
        (c, t) -> (cnt, microLog(cnt + 1.0) - microLog(tot.toDouble + v))
      }).toMap
      val gotModel = NaiveBayes.fit(df, "cls", "text", vocabSize)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      // reference MAP over the same docs — prior classes span ALL doc
      // classes (a class with zero tokens still has a prior; its
      // missing model rows contribute 0, mirroring predict's coalesce)
      val n = docs.size.toLong
      val priorClasses = docs.map(_._2).distinct
      val prior = priorClasses.map(c =>
        c -> (microLog(docs.count(_._2 == c).toDouble) - microLog(n.toDouble))).toMap
      val wantPred = docs.map { case (id, actual, t) =>
        val ts = t.split(" ").filter(_.nonEmpty).filter(vocab.contains)
        val scored = priorClasses.map { c =>
          c -> (prior(c) + ts.map(tk => wantModel.getOrElse((c, tk), (0L, 0L))._2).sum)
        }
        val best = scored.minBy { case (c, s) => (-s, c) }
        (id, actual, best._1, best._2)
      }.sortBy(_._1)
      val gotPred = NaiveBayes.predict(df, "id", "cls", "text",
        NaiveBayes.fit(df, "cls", "text", vocabSize),
        NaiveBayes.priors(df, "cls", "text"))
        .orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      gotModel == wantModel && gotPred == wantPred
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("predict plans broadcast the model and priors (no shuffled dimension join)") {
    val model = NaiveBayes.fit(train, "cls", "text", vocabSize = 10)
    val pri = NaiveBayes.priors(train, "cls", "text")
    val plan = NaiveBayes.predict(train, "id", "cls", "text", model, pri)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("predictFolds ≡ per-fold predict union (fold routing, scores, ties)") {
    val docs = Seq(
      (0L, "a", "cat sat mat"), (1L, "a", "cat cat"), (2L, "b", "dog ran"),
      (3L, "b", "dog dog barks"), (4L, "a", "cat dog"), (5L, "b", "zzz"),
      (6L, "a", "sat"), (7L, "b", "dog cat cat"), (8L, "a", ""),
      (9L, "b", "barks mat")).toDF("id", "cls", "text")
    val nFolds = 3
    val models = (0 until nFolds).map { f =>
      val tr = docs.filter(col("id") % nFolds =!= f)
      (NaiveBayes.fit(tr, "cls", "text", vocabSize = 8),
        NaiveBayes.priors(tr, "cls", "text"))
    }
    val want = (0 until nFolds).map { f =>
      NaiveBayes.predict(docs.filter(col("id") % nFolds === f),
        "id", "cls", "text", models(f)._1, models(f)._2)
        .select(lit(f.toLong).as("fold"), col("id"), col("actual"),
          col("predicted"), col("score_micro"))
    }.reduce(_ unionByName _).orderBy("fold", "id").collect().toSeq
    val got = NaiveBayes.predictFolds(docs, "id", "cls", "text",
      col("id") % nFolds, models)
      .orderBy("fold", "id").collect().toSeq
    assert(got === want)
  }

  test("model and predictions are identical under different partitionings") {
    val m1 = NaiveBayes.fit(train.repartition(1), "cls", "text", 10)
      .orderBy("cls", "token").collect().toSeq
    val m7 = NaiveBayes.fit(train.repartition(7), "cls", "text", 10)
      .orderBy("cls", "token").collect().toSeq
    assert(m1 === m7)
  }
}
