package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkFunSuite {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "rare alpha beta beta"),          // rare + 2 common
      (2L, "alpha beta alpha beta alpha beta alpha beta"), // long, common only
      (3L, "alpha beta"),                    // short, common only
      (4L, "gamma gamma gamma"),             // no query terms
      (5L, "rare rare alpha")                // rare-heavy, short
    ).toDF("doc_id", "text")
  }

  test("bm25: rare-term docs outrank common-only docs; ranks dense from 1") {
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("rare", "alpha", "beta"), k = 10).collect()
    assert(r.map(_.getLong(3)).toSeq === (1L to r.length))
    val rankOf = r.map(x => x.getLong(0) -> x.getLong(3)).toMap
    // docs 1 and 5 contain "rare" (df=2 of 5) — idf dwarfs the common terms'
    assert(rankOf(1L) <= 2 && rankOf(5L) <= 2)
    assert(!rankOf.contains(4L)) // zero matching terms → absent, not scored 0
    // saturation: doc 2 has 4x the "alpha" tf of doc 3 but is also 4x
    // longer — its per-term tf component must stay bounded by k1+1
    val scores = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(scores.values.forall(s => s > 0.0 && s.isFinite))
  }

  test("query likelihood (Dirichlet): matches the direct formula; non-matching docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "d d d")).toDF("doc_id", "text")
    val r = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("a", "b"), k = 10).collect()
    // reference: score = Σ_t ln((tf + μ·cf/T) / (dl + μ)), T = 8,
    // cf(a)=3, cf(b)=1, μ=2000
    def ref(tfA: Long, tfB: Long, dl: Long): Double = {
      val mu = 2000.0; val T = 8.0
      math.log((tfA + mu * 3 / T) / (dl + mu)) +
        math.log((tfB + mu * 1 / T) / (dl + mu))
    }
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(!byId.contains(3L)) // no query term → unranked
    assert(byId(1L).getLong(1) === 2L) // n_terms present
    assert(byId(2L).getLong(1) === 1L)
    assert(math.abs(byId(1L).getDouble(2) - ref(2, 1, 3)) < 5e-6)
    assert(math.abs(byId(2L).getDouble(2) - ref(1, 0, 2)) < 5e-6)
    // doc 1 has both terms and higher tf — must rank first
    assert(byId(1L).getLong(3) === 1L && byId(2L).getLong(3) === 2L)
  }

  test("query likelihood: zero-cf query terms drop from Q' on both axes") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a a")).toDF("doc_id", "text")
    val with_ = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("a", "zzz"), k = 10).collect()
    val without = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("a"), k = 10).collect()
    assert(with_.map(_.toSeq).toSeq === without.map(_.toSeq).toSeq)
  }

  test("rm3: model interpolates original and feedback mass; second pass is exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare alpha beta beta"),
      (2L, "rare gamma alpha"),
      (3L, "alpha beta"),
      (4L, "delta delta gamma"),
      (5L, "rare rare gamma")).toDF("doc_id", "text")
    val model = Retrieval.rm3Model(docs, "doc_id", "text",
      Seq("rare", "beta"), fbDocs = 3, fbTerms = 5).collect()
    val byTerm = model.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // originals carry the λ·1/|Q| floor = 250000 even with no
    // feedback mass; every original flagged
    assert(byTerm("rare")._3 && byTerm("beta")._3)
    assert(byTerm("rare")._2 >= 250000L && byTerm("beta")._2 >= 250000L)
    // expansion terms come only from the feedback docs' vocabulary
    val expansion = model.filter(!_.getBoolean(3)).map(_.getString(0)).toSet
    val fbVocab = Set("rare", "alpha", "beta", "gamma")
    assert(expansion.subsetOf(fbVocab -- Set("rare", "beta")))
    expansion.foreach(t => assert(byTerm(t)._2 > 0L))
    // weights decompose: total mass = 2·250000 (orig) + 500000 (rm)
    assert(model.map(_.getLong(2)).sum <= 1000000L)
    // second pass: exact integer scores, dense ranks, deterministic
    val r1 = Retrieval.rm3TopK(docs, "doc_id", "text",
      Seq("rare", "beta"), k = 5, fbDocs = 3, fbTerms = 5).collect()
    val r2 = Retrieval.rm3TopK(docs, "doc_id", "text",
      Seq("rare", "beta"), k = 5, fbDocs = 3, fbTerms = 5).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    assert(r1.map(_.getLong(3)).toSeq === (1L to r1.length))
    // doc 4 shares only the expansion term gamma — rankable via
    // feedback even though it has no original query term
    assert(r1.map(_.getLong(0)).contains(4L) ===
      expansion.contains("gamma"))
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    import spark.implicits._
    val d = Seq(
      (1L, "term pad pad pad pad pad pad pad"),
      (2L, "term pad")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(d, "doc_id", "text", Seq("term"), k = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(2L) > r(1L))
  }

  test("bm25: k bounds the result and the plan takes ordered-project, not a global sort") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("alpha"), k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("alpha"), k = 2)
      .count() === 2)
  }

  test("query likelihood: plan takes ordered-project; only query terms shuffle") {
    val q = Retrieval.queryLikelihoodTopK(corpus, "doc_id", "text",
      Seq("rare", "alpha"), k = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the term filter sits below the aggregate: the exchange carries
    // only matching (doc, term) rows, never the token stream
    assert(plan.contains("isin") || plan.contains("IN ("), plan)
    assert(q.count() === 3)
  }

  test("bm25BatchTopK: scores are bit-identical to the single-query path") {
    val queries = Seq(
      1L -> Seq("rare", "alpha"),
      2L -> Seq("beta"),
      3L -> Seq("rare", "gamma"))
    val batch = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    queries.foreach { case (qid, terms) =>
      val single = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
        .collect()
      assert(single.nonEmpty, s"query $qid")
      single.foreach { r =>
        val got = batch((qid, r.getLong(0)))
        assert(got._1 === r.getDouble(2), s"query $qid doc ${r.getLong(0)} score")
        assert(got._2 === r.getLong(3), s"query $qid doc ${r.getLong(0)} rank")
      }
      assert(batch.keys.count(_._1 == qid) === single.length, s"query $qid row count")
    }
  }

  test("bm25BatchTopK: per-query top-k is a bounded aggregate, not a window sort") {
    val plan = Retrieval.bm25BatchTopK(corpus, "doc_id", "text",
      Seq(1L -> Seq("alpha"), 2L -> Seq("beta")), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), s"no bounded top-k aggregate in:\n$plan")
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
    // validation
    intercept[IllegalArgumentException](
      Retrieval.bm25BatchTopK(corpus, "doc_id", "text", Seq.empty, k = 2))
    intercept[IllegalArgumentException](
      Retrieval.bm25BatchTopK(corpus, "doc_id", "text", Seq(1L -> Seq()), k = 2))
    intercept[IllegalArgumentException](
      Retrieval.bm25BatchTopK(corpus, "doc_id", "text",
        Seq(1L -> Seq("alpha"), 1L -> Seq("beta")), k = 2))
  }

  test("rrfFuse: overlap beats single-list, absent side carries rank 0") {
    import spark.implicits._
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "a_rnk")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("id", "b_rnk")
    val r = Retrieval.rrfFuse(a, b, "id", "a_rnk", "b_rnk", k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toList
    val byId = r.map(t => t._1 -> t).toMap
    // 11 is in both lists → strictly larger than any single-list doc
    assert(r.head._1 === 11L)
    assert(byId(11L)._4 > byId(10L)._4)
    // absent ranks surface as 0, not null
    assert(byId(10L)._3 === 0L && byId(13L)._2 === 0L)
    // exact rrf values: 1/(60+r) terms
    assert(math.abs(byId(11L)._4 - math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(byId(12L)._4 - math.rint(1.0 / 63 * 1e6) / 1e6) < 1e-9)
  }

  test("rrfFuse: equal-rrf ties break on id; k truncates after fusion") {
    import spark.implicits._
    // 20 and 30 each appear only in one list at the same rank → equal rrf
    val a = Seq((30L, 1L)).toDF("id", "a_rnk")
    val b = Seq((20L, 1L)).toDF("id", "b_rnk")
    val all = Retrieval.rrfFuse(a, b, "id", "a_rnk", "b_rnk", k = 10).collect()
    assert(all.map(_.getLong(0)).toSeq === Seq(20L, 30L))
    val cut = Retrieval.rrfFuse(a, b, "id", "a_rnk", "b_rnk", k = 1).collect()
    assert(cut.map(_.getLong(0)).toSeq === Seq(20L))
  }

  test("phraseTopK: adjacency only, overlaps count, order insensitive to bag") {
    import spark.implicits._
    val d = Seq(
      (1L, "new york new york city"), // 2 overlapping-window hits
      (2L, "york new"),               // reversed — NOT the phrase
      (3L, "new pad york"),           // gapped — NOT the phrase
      (4L, "new york"),               // 1 hit
      (5L, "a a a")                   // self-overlap control corpus
    ).toDF("doc_id", "text")
    val r = Retrieval.phraseTopK(d, "doc_id", "text", Seq("new", "york"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 2L, 1L), (4L, 1L, 2L)))
    // overlapping occurrences of a self-similar phrase all count
    val s = Retrieval.phraseTopK(d, "doc_id", "text", Seq("a", "a"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(s.toSeq === Seq((5L, 2L)))
  }

  test("proximityTopK: min pair distance ranks; window boundary inclusive") {
    import spark.implicits._
    val d = Seq(
      (1L, "x pad pad y"),        // dist 3
      (2L, "x y"),                // dist 1
      (3L, "y pad x"),            // dist 2 (order-free)
      (4L, "x pad pad pad pad y"),// dist 5 = window → included
      (5L, "x pad pad pad pad pad y"), // dist 6 → excluded
      (6L, "x only here"),        // no y → excluded
      (7L, "x y x y")             // dists {1,1,3,1} → min 1, 4 pairs ≤ 5
    ).toDF("doc_id", "text")
    val r = Retrieval.proximityTopK(d, "doc_id", "text", "x", "y", window = 5, k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      (2L, 1L, 1L, 1L), (7L, 1L, 4L, 2L), (3L, 2L, 1L, 3L),
      (1L, 3L, 1L, 4L), (4L, 5L, 1L, 5L)))
  }

  test("passAtK: closed form, n-c < k collapse, k > n undefined, any k") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def binom(n: Long, k: Long): Double =
      if (k > n) 0.0
      else (0L until k).map(i => (n - i).toDouble / (k - i)).product
    val cases = Seq((10L, 3L), (16L, 16L), (16L, 0L), (5L, 2L), (8L, 7L))
    val df = cases.toDF("n", "c")
    for (k <- Seq(1, 2, 4, 7, 10)) {
      val got = df.select(col("n"), col("c"),
          Retrieval.passAtK(col("n"), col("c"), k).as("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      for ((n, c) <- cases) {
        val expected =
          if (k > n) None
          else Some(math.rint((1.0 - binom(n - c, k) / binom(n, k)) * 1e6) / 1e6)
        val g = got((n, c))
        assert((g, expected) match {
          case (None, None) => true
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case _ => false
        }, s"k=$k n=$n c=$c got=$g want=$expected")
      }
    }
    // n-c < k exactly -> pass@k = 1 (zero numerator factor, no special case)
    val collapse = Seq((12L, 9L)).toDF("n", "c")
      .select(Retrieval.passAtK(col("n"), col("c"), 4).as("p"))
      .head().getDouble(0)
    assert(collapse === 1.0)
    intercept[IllegalArgumentException](Retrieval.passAtK(col("n"), col("c"), 0))
  }

  test("mmrRerank: diversity beats redundancy; rank 1 is argmax rel") {
    import spark.implicits._
    // candidates in one group: ids 1,2 are near-duplicates (sim ~1),
    // id 3 is orthogonal with modest relevance. With lambda=0.7 the
    // redundant id 2 (rel .90 but max_sim ~1) must lose rank 2 to the
    // diverse id 3 (rel .50, max_sim 0).
    val cand = Seq(
      (0L, 1L, 0.99, Array(1.0f, 0.0f)),
      (0L, 2L, 0.90, Array(1.0f, 0.001f)),
      (0L, 3L, 0.50, Array(0.0f, 1.0f)))
      .toDF("g", "id", "rel", "vec")
    val r = Retrieval.mmrRerank(cand, "g", "id", "vec", "rel", k = 3)
      .orderBy("rnk").collect()
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
    assert(r(0).getDouble(4) === 0.0)        // first pick: max_sim pinned 0
    assert(r(0).getDouble(5) === 0.7 * 0.99) // and mmr = lambda * rel
    assert(r(1).getDouble(4) === 0.0)        // orthogonal pick: sim 0
    assert(r(2).getDouble(4) > 0.99)         // the near-dup's penalty
  }

  test("mmrRerank: ties break on least id; short pools emit fewer rows") {
    import spark.implicits._
    val cand = Seq(
      (0L, 7L, 0.5, Array(1.0f, 0.0f)),
      (0L, 4L, 0.5, Array(1.0f, 0.0f))) // identical rel AND vector
      .toDF("g", "id", "rel", "vec")
    val r = Retrieval.mmrRerank(cand, "g", "id", "vec", "rel", k = 5)
      .orderBy("rnk").collect()
    assert(r.length === 2)
    assert(r.map(_.getLong(2)).toSeq === Seq(4L, 7L))
  }

  test("mmrRerank: negative similarities are not clamped after pick 1") {
    import spark.implicits._
    // id 2 points AWAY from pick 1 -> max_sim is negative, boosting it
    val cand = Seq(
      (0L, 1L, 0.9, Array(1.0f, 0.0f)),
      (0L, 2L, 0.1, Array(-1.0f, 0.0f)),
      (0L, 3L, 0.2, Array(1.0f, 0.0f)))
      .toDF("g", "id", "rel", "vec")
    val r = Retrieval.mmrRerank(cand, "g", "id", "vec", "rel", k = 2)
      .orderBy("rnk").collect()
    // id 2: 0.7*0.1 - 0.3*(-1) = 0.37 > id 3: 0.7*0.2 - 0.3*1 = -0.16
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    assert(r(1).getDouble(4) === -1.0)
  }

  test("postingsStats: df/cf/gaps exact; df ties break on term asc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"), (3L, "x x z"), (7L, "x w z"))
      .toDF("doc_id", "text")
    val r = Retrieval.postingsStats(docs, "doc_id", "text", k = 10)
      .orderBy("rnk").collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
    // x: df 3 (docs 1,3,7), cf 4, gaps 2 and 4 -> max 4
    assert(r.head === ("x" -> ((3L, 4L, 1L, 7L, 4L))))
    // z: df 2 (3,7) gap 4; w/y df 1 gap 0, tie on term asc
    val order = r.map(_._1).toSeq
    assert(order === Seq("x", "z", "w", "y"))
    assert(r.toMap.apply("z") === ((2L, 2L, 3L, 7L, 4L)))
    assert(r.toMap.apply("w")._5 === 0L) // single-posting gap is 0
  }

  test("rankBiasedOverlap: identical lists -> 1 - p^k; disjoint -> 0") {
    import spark.implicits._
    val a = (1L to 10L).map(r => (0L, r * 100, r)).toDF("q", "id", "ra")
    val same = a.select(col("q"), col("id"), col("ra").as("rb"))
    val r1 = Retrieval.rankBiasedOverlap(a, same, "q", "id", "ra", "rb",
      k = 10).collect().head
    // identical: X_d = d, term_d = p^(d-1), rbo = (1-p) * sum ~ 1 - p^10
    // (replicate the operator's exact op order incl the (w*d)/d trip)
    val pw = Iterator.iterate(1.0)(_ * 0.9).take(10).toSeq
    val nano = (1 to 10).map(d =>
      math.floor(pw(d - 1) * d / d * 1e9 + 0.5).toLong).sum
    val want = BigDecimal((1.0 - 0.9) * (nano.toDouble / 1e9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(2) === want)
    assert(math.abs(want - (1.0 - math.pow(0.9, 10))) < 1e-6)
    assert(r1.getLong(1) === 10L)
    val disj = (1L to 10L).map(r => (0L, r * 7 + 1, r)).toDF("q", "id", "rb")
    val r0 = Retrieval.rankBiasedOverlap(a, disj, "q", "id", "ra", "rb",
      k = 10).collect().head
    assert(r0.getDouble(2) === 0.0 && r0.getLong(1) === 0L)
  }

  test("rankBiasedOverlap: top-weighted - early overlap beats late overlap") {
    import spark.implicits._
    val a = (1L to 10L).map(r => (0L, r, r)).toDF("q", "id", "ra")
    // b1 agrees on ranks 1-2 only; b2 agrees on ranks 9-10 only
    val b1 = Seq((0L, 1L, 1L), (0L, 2L, 2L)) ++
      (3L to 10L).map(r => (0L, r + 50, r))
    val b2 = Seq((0L, 9L, 9L), (0L, 10L, 10L)) ++
      (1L to 8L).map(r => (0L, r + 50, r))
    val e = Retrieval.rankBiasedOverlap(a, b1.toDF("q", "id", "rb"),
      "q", "id", "ra", "rb", k = 10).collect().head.getDouble(2)
    val l = Retrieval.rankBiasedOverlap(a, b2.toDF("q", "id", "rb"),
      "q", "id", "ra", "rb", k = 10).collect().head.getDouble(2)
    assert(e > l, s"early $e should beat late $l")
    assert(e > 0.0 && l > 0.0)
  }

  test("rankBiasedOverlap: per-query rows survive zero overlap") {
    import spark.implicits._
    val a = Seq((0L, 1L, 1L), (1L, 2L, 1L)).toDF("q", "id", "ra")
    val b = Seq((0L, 1L, 1L), (1L, 99L, 1L)).toDF("q", "id", "rb")
    val r = Retrieval.rankBiasedOverlap(a, b, "q", "id", "ra", "rb", k = 5)
      .orderBy("q").collect()
    assert(r.length === 2)
    assert(r(1).getDouble(2) === 0.0)
    assert(r(0).getDouble(2) > 0.0)
  }

  test("mrr: first relevant rank per query, whole batch in the denominator") {
    import spark.implicits._
    // q1: relevant at ranks 2 and 4 → rr = 10⁶ div 2; q2: nothing
    // relevant; q3: relevant at rank 1 but only BEYOND k=3 for rank 5
    val ranked = Seq(
      (1L, 1L, false), (1L, 2L, true), (1L, 4L, true),
      (2L, 1L, false), (2L, 3L, false),
      (3L, 1L, true), (3L, 5L, true)
    ).toDF("q", "rnk", "rel")
    val r = Retrieval.mrrCard(ranked, "q", "rnk", "rel", k = 3, nQueries = 4L)
      .collect().head
    assert(r.getLong(0) === 4L)                 // 4th query never ranked
    assert(r.getLong(1) === 2L)                 // q1 and q3 answered
    assert(r.getLong(2) === 500000L + 1000000L)
    assert(r.getLong(3) === 1500000L / 4L)
  }

  test("mrr: relevance past k does not count; empty input → zero card") {
    import spark.implicits._
    val ranked = Seq((1L, 7L, true)).toDF("q", "rnk", "rel")
    val r = Retrieval.mrrCard(ranked, "q", "rnk", "rel", k = 5, nQueries = 2L)
      .collect().head
    assert((0 to 3).map(r.getLong) === Seq(2L, 0L, 0L, 0L))
    val empty = Seq.empty[(Long, Long, Boolean)].toDF("q", "rnk", "rel")
    val e = Retrieval.mrrCard(empty, "q", "rnk", "rel", k = 5, nQueries = 3L)
      .collect().head
    assert((0 to 3).map(e.getLong) === Seq(3L, 0L, 0L, 0L))
  }

  test("mrr: micro-grid quantization is div, not round") {
    import spark.implicits._
    val ranked = Seq((1L, 3L, true)).toDF("q", "rnk", "rel")
    val r = Retrieval.mrrCard(ranked, "q", "rnk", "rel", k = 10, nQueries = 1L)
      .collect().head
    assert(r.getLong(2) === 333333L) // 10⁶ div 3, floor not half-up
    assert(r.getLong(3) === 333333L)
  }

  test("map: textbook AP check, corpus misses divide the score down") {
    import spark.implicits._
    // q1: relevant at ranks 1 and 3, corpus has 4 relevant →
    //   AP = (10⁶·1 div 1 + 10⁶·2 div 3) div min(4, 10)
    // q2: nothing relevant in top-k but 2 in the corpus → AP = 0
    val ranked = Seq(
      (1L, 1L, true), (1L, 2L, false), (1L, 3L, true),
      (2L, 1L, false), (2L, 2L, false)
    ).toDF("q", "rnk", "rel")
    val tot = Seq((1L, 4L), (2L, 2L)).toDF("q", "n_rel_corpus")
    val r = Retrieval.mapCard(ranked, "q", "rnk", "rel", k = 10, tot,
      nQueries = 2L).collect().head
    val ap1 = (1000000L + 2000000L / 3L) / 4L
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === ap1)
    assert(r.getLong(2) === ap1 / 2L)
  }

  test("map: AP denominator caps at k; zero-relevant corpus scores 0 not null") {
    import spark.implicits._
    val ranked = (1L to 10L).map(r => (1L, r, true)).toDF("q", "rnk", "rel")
    val tot = Seq((1L, 50L), (2L, 0L)).toDF("q", "n_rel_corpus")
    val r = Retrieval.mapCard(ranked, "q", "rnk", "rel", k = 10, tot,
      nQueries = 2L).collect().head
    // perfect ranking: every precision@r = 10⁶ → AP = 10⁷ div min(50,10)
    assert(r.getLong(1) === 1000000L)
    assert(r.getLong(2) === 500000L)
  }

  test("map: ranks beyond k are ignored") {
    import spark.implicits._
    val ranked = Seq((1L, 1L, true), (1L, 7L, true)).toDF("q", "rnk", "rel")
    val tot = Seq((1L, 2L)).toDF("q", "n_rel_corpus")
    val r = Retrieval.mapCard(ranked, "q", "rnk", "rel", k = 5, tot,
      nQueries = 1L).collect().head
    assert(r.getLong(1) === 1000000L / 2L)
  }

  test("kendall: identical rankings score 1, reversed score -1") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rnk")
    val same = Retrieval.kendallTau(a, a, "id", "rnk").collect().head
    assert((same.getLong(0), same.getLong(1), same.getLong(2)) === (3L, 3L, 3L))
    assert((same.getLong(3), same.getLong(4)) === (3L, 0L))
    assert(same.getDouble(5) === 1.0)
    val rev = Seq((10L, 3L), (20L, 2L), (30L, 1L)).toDF("id", "rnk")
    assert(Retrieval.kendallTau(a, rev, "id", "rnk")
      .collect().head.getDouble(5) === -1.0)
  }

  test("kendall: hand case with one swap; partial overlap counts only common") {
    import spark.implicits._
    // common = {10,20,30}; b swaps 20/30 → C=2, D=1, τ = 1/3
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L)).toDF("id", "rnk")
    val b = Seq((10L, 1L), (30L, 2L), (20L, 3L), (50L, 4L)).toDF("id", "rnk")
    val r = Retrieval.kendallTau(a, b, "id", "rnk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (4L, 4L, 3L))
    assert((r.getLong(3), r.getLong(4)) === (2L, 1L))
    assert(r.getDouble(5) === math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("kendall: randomized replay against the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val ids = rnd.shuffle((1L to 40L).toVector)
      val aIds = ids.take(10 + rnd.nextInt(10))
      val bIds = rnd.shuffle(ids).take(10 + rnd.nextInt(10))
      val a = aIds.zipWithIndex.map { case (id, i) => (id, i + 1L) }
      val b = bIds.zipWithIndex.map { case (id, i) => (id, i + 1L) }
      val ra = a.toMap; val rb = b.toMap
      val common = (ra.keySet & rb.keySet).toSeq.sorted
      val pairs = for {
        i <- common.indices; j <- (i + 1) until common.size
      } yield (common(i), common(j))
      val c = pairs.count { case (p, q) =>
        (ra(p) < ra(q)) == (rb(p) < rb(q)) }
      val d = pairs.size - c
      val r = Retrieval.kendallTau(a.toDF("id", "rnk"), b.toDF("id", "rnk"),
        "id", "rnk").collect().head
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
        (common.size.toLong, c.toLong, d.toLong))
      val want = if (common.size >= 2)
        math.rint((c - d).toDouble /
          (common.size.toDouble * (common.size - 1) / 2.0) * 1e6) / 1e6
      else 0.0
      assert(r.getDouble(5) === want)
    }
  }

  test("kendall: fewer than two common items reports tau 0, not null") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rnk")
    val b = Seq((10L, 1L), (99L, 2L)).toDF("id", "rnk")
    val r = Retrieval.kendallTau(a, b, "id", "rnk").collect().head
    assert(r.getLong(2) === 1L)
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) === (0L, 0L, 0.0))
  }

  test("ndcg: gain table pins log2 exactly once; prefix sums consistent") {
    assert(Retrieval.DcgGainMicro(0) === 1000000L)          // 1/log2(2)
    assert(Retrieval.DcgGainMicro(1) === 630930L)           // 1/log2(3)
    assert(Retrieval.DcgGainMicro(2) === 500000L)           // 1/log2(4)
    assert(Retrieval.DcgPrefixMicro(1) ===
      Retrieval.DcgGainMicro(0) + Retrieval.DcgGainMicro(1))
    assert(Retrieval.DcgPrefixMicro.length === Retrieval.MaxNdcgRank)
  }

  test("ndcg: relevant at ranks 1 and 3 of a 2-relevant corpus") {
    import spark.implicits._
    val ranked = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("rnk", "rel")
    val tot = Seq(Tuple1(2L)).toDF("n_rel_corpus")
    val r = Retrieval.ndcgCard(ranked, "rnk", "rel", k = 10, tot)
      .collect().head
    val dcg = 1000000L + 500000L
    val idcg = 1000000L + 630930L
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === dcg)
    assert(r.getLong(2) === idcg)
    assert(r.getLong(3) === (1000L * dcg) / idcg)
  }

  test("ndcg: no relevant docs → all-zero card, not nulls") {
    import spark.implicits._
    val ranked = Seq((1L, false), (2L, false)).toDF("rnk", "rel")
    val tot = Seq(Tuple1(0L)).toDF("n_rel_corpus")
    val r = Retrieval.ndcgCard(ranked, "rnk", "rel", k = 10, tot)
      .collect().head
    assert((0 to 3).map(r.getLong) === Seq(0L, 0L, 0L, 0L))
  }

  test("ndcg: corpus with more relevant than k caps the ideal at k") {
    import spark.implicits._
    val ranked = (1L to 10L).map(r => (r, true)).toDF("rnk", "rel")
    val tot = Seq(Tuple1(50L)).toDF("n_rel_corpus")
    val r = Retrieval.ndcgCard(ranked, "rnk", "rel", k = 10, tot)
      .collect().head
    // perfect ranking of 10 relevant in top-10 vs ideal capped at 10
    assert(r.getLong(1) === Retrieval.DcgPrefixMicro(9))
    assert(r.getLong(2) === Retrieval.DcgPrefixMicro(9))
    assert(r.getLong(3) === 1000L)
  }
}
