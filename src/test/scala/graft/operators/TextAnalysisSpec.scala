package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkFunSuite {

  private def toy = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the hat", "en"),
      (2L, "der hund und die katze", "de"),
      (3L, "le chat et la table", "fr")
    ).toDF("doc_id", "text", "lang")
  }

  test("textStats: hand-computed row") {
    val r = TextAnalysis.textStats(toy, "doc_id", "text")
      .where(col("doc_id") === 1).head
    assert(r.getLong(1) === 19L) // len("the cat and the hat")
    assert(r.getLong(2) === 5L)  // tokens
    assert(r.getLong(3) === 4L)  // distinct ("the" twice)
    assert(r.getDouble(4) === 0.8) // ttr 4/5
    // stopwords {the,a,of,and}: the,and,the = 3 hits → 0.6
    assert(r.getDouble(5) === 0.6)
  }

  test("tokenCounts: regex classes") {
    import spark.implicits._
    val d = Seq((1L, "abc 123 x9y")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(d, "doc_id", "text").head
    assert(r.getLong(1) === 3L) // abc, x, y
    assert(r.getLong(2) === 2L) // 123, 9
    assert(r.getLong(3) === 3L) // whitespace tokens
  }

  test("languageId: marker argmax with deterministic tie order") {
    val rows = TextAnalysis.languageId(toy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(rows(1L) === "en")
    assert(rows(2L) === "de")
    assert(rows(3L) === "fr")
  }

  test("fingerprint is standard md5 of lowercased text") {
    import spark.implicits._
    val d = Seq((1L, "Hello World")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text").head.getString(1)
    // md5("hello world") — well-known digest
    assert(fp === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("tfIdfTopTerms: discriminative terms outrank ubiquitous ones") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple apple common"),
      (2L, "banana common"),
      (3L, "cherry common")).toDF("doc_id", "text")
    val top1 = TextAnalysis.tfIdfTopTerms(d, "doc_id", "text", topK = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" has df=3 → idf=ln(1)=0; unique terms win every doc
    assert(top1 === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("tfIdfTopTerms plan construction runs NO job (corpus size stays in-plan)") {
    import spark.implicits._
    // A docs frame that explodes if any partition is ever computed: a
    // driver-side docs.count() at plan-build time (the old regression)
    // would throw here; a purely declarative build must succeed.
    val poison = Seq((1L, "a b c"), (2L, "b c d")).toDS()
      .map { r =>
        if (r._1 >= 0L) // always true at runtime, opaque to the compiler
          throw new RuntimeException("plan-build must not compute the corpus")
        r
      }
      .toDF("doc_id", "text")
    val df = TextAnalysis.tfIdfTopTerms(poison, "doc_id", "text", topK = 3)
    assert(df.columns.toSeq ===
      Seq("doc_id", "term", "tf", "df", "tfidf", "rnk"))
    // sanity: the poison does fire when the plan actually executes
    intercept[org.apache.spark.SparkException](df.collect())
  }

  test("langStats aggregates per language") {
    val r = TextAnalysis.langStats(toy, "lang", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(r === Set(("en", 1L, 5L), ("de", 1L, 5L), ("fr", 1L, 5L)))
  }

  test("qualityScore: hand-computed checks and composite") {
    val r = TextAnalysis.qualityScore(toy, "doc_id", "text",
      minTokens = 3, maxTokens = 10, minStopRatio = 0.1, maxPunctRatio = 0.2)
      .where(col("doc_id") === 1).head
    // "the cat and the hat": 5 tokens, 19 chars, mean word len (19-4)/5=3.0
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Double]("mean_word_len") === 3.0)
    assert(r.getAs[Double]("stopword_ratio") === 0.6) // the, and, the
    assert(r.getAs[Double]("punct_ratio") === 0.0)
    assert(r.getAs[Long]("checks_passed") === 4L)
    assert(r.getAs[Double]("quality") === 1.0)
  }

  test("qualityScore: failing checks lower the composite") {
    import spark.implicits._
    val junk = Seq((1L, "!!! ### $$$ %%%")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(junk, "doc_id", "text",
      minTokens = 10, maxTokens = 100, minStopRatio = 0.1, maxPunctRatio = 0.2)
      .head
    assert(r.getAs[Long]("checks_passed") === 1L) // only mean_word_len in [3,10]
    assert(r.getAs[Double]("quality") === 0.25)
  }

  test("tokenLogFreqScore: common-token docs outscore rare-token docs, hand-computed") {
    import spark.implicits._
    // corpus frequencies: "the"=3, "cat"=2, "zyx"=1, "sat"=1
    val docs = Seq(
      (1L, "the cat sat"),   // freqs 3,2,1
      (2L, "the the cat"),   // freqs 3,3,2
      (3L, "zyx")).toDF("doc_id", "text") // freq 1
    val got = TextAnalysis.tokenLogFreqScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def l10(x: Double) = math.rint(math.log10(x) * 1e6) / 1e6
    def avg6(xs: Seq[Double]) = math.rint(xs.sum / xs.length * 1e6) / 1e6
    assert(got(1L) === ((3L, avg6(Seq(l10(3), l10(2), l10(1))))))
    assert(got(2L) === ((3L, avg6(Seq(l10(3), l10(3), l10(2))))))
    assert(got(3L) === ((1L, 0.0)))
    assert(got(2L)._2 > got(1L)._2 && got(1L)._2 > got(3L)._2) // fluent > mixed > gibberish
  }

  test("tokenLogFreqScore is partition-order independent (DECIMAL accumulation)") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 5} filler common common"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.tokenLogFreqScore(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = TextAnalysis.tokenLogFreqScore(docs.orderBy(rand(3)).repartition(11), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a === b)
  }

  test("corpusDatacard: hand-computed one-row summary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "en", "s2"),   // exact dup of 1
      (3L, "A b C", "de", "s1"),   // dup after lowercasing
      (4L, "d e", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.corpusDatacard(docs, "doc_id", "text", "lang", "source").head
    assert(r.getLong(0) === 4L)      // n_docs
    assert(r.getLong(1) === 2L)      // distinct canonical texts: {a b c, d e}
    assert(r.getLong(2) === 2L)      // dup surplus
    assert(r.getLong(3) === 11L)     // total tokens 3+3+3+2
    assert(r.getDouble(4) === 2.75)  // avg
    assert(r.getLong(5) === 2L)      // langs
    assert(r.getLong(6) === 2L)      // sources
  }

  test("sourceScorecard: hand-computed per-source rollup") {
    import spark.implicits._
    val good = ("word " * 24) + "the"  // 25 tokens, mean 3.96, stop .04 → pass
    val docs = Seq(
      (1L, good, "s1"), (2L, good, "s1"),      // exact dups, both pass
      (3L, "x y", "s1"),                        // 2 tokens → fail
      (4L, "!!!", "s2")                         // fail
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceScorecard(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("s1", "s2"))
    assert(r.map(_.getLong(1)).toSeq === Seq(3L, 1L))        // n_docs
    assert(r.map(_.getLong(2)).toSeq === Seq(52L, 1L))       // total_tokens
    assert(r.map(_.getDouble(3)).toSeq === Seq(17.3333, 1.0)) // mean_tokens
    assert(r.map(_.getLong(4)).toSeq === Seq(2L, 0L))        // pass_docs
    assert(r.map(_.getDouble(5)).toSeq === Seq(0.6667, 0.0)) // pass_rate
    assert(r.map(_.getLong(6)).toSeq === Seq(1L, 0L))        // dup_docs
  }

  test("corpusDiff: added/removed/retained by canonical text, re-ingested ids retained") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha beta"), (2L, "Gamma Delta"), (3L, "gone text"))
      .toDF("doc_id", "text")
    val v2 = Seq(
      (10L, "alpha beta"),     // same text, new id → retained
      (11L, "gamma delta"),    // case-variant of 2 → retained (canonical)
      (12L, "gamma delta"),    // retained dup: counts on the new side
      (13L, "brand new doc")   // added
    ).toDF("doc_id", "text")
    val r = TextAnalysis.corpusDiff(v1, v2, "text").orderBy("status")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(
      ("added", 1L, 1L),
      ("removed", 1L, 1L),     // "gone text"
      ("retained", 2L, 3L)))   // 2 texts, 3 new-side docs
  }

  test("logFreqBuckets: terciles split a strictly-increasing score ladder 3/3/3") {
    import spark.implicits._
    // doc i = its own token repeated (i+1) times → its score is
    // round(log10(i+1), 6): nine strictly increasing scores.
    val docs = (0 until 9)
      .map(i => (i.toLong, Seq.fill(i + 1)(s"w$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.logFreqBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "bucket").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L))
  }

  test("logFreqBuckets: strata are calibrated independently") {
    import spark.implicits._
    // Stratum B's scores all sit ABOVE stratum A's; within each
    // stratum the buckets must still spread 0/1/2 (a global threshold
    // would put all of A in the tail and all of B in the head).
    val a = (0 until 6).map(i => (i.toLong, Seq.fill(i + 1)(s"a$i").mkString(" "), "A"))
    val b = (0 until 6).map(i => (100L + i, Seq.fill(50 + 10 * i)(s"b$i").mkString(" "), "B"))
    val got = TextAnalysis.logFreqBuckets((a ++ b).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .select("lang", "bucket").as[(String, Long)].collect()
    Seq("A", "B").foreach { s =>
      val buckets = got.filter(_._1 == s).map(_._2).toSet
      assert(buckets === Set(0L, 1L, 2L), s"stratum $s got $buckets")
    }
  }

  test("logFreqBuckets: approx thresholds (the 100 TB path) stay within a rank of exact") {
    import spark.implicits._
    // percentile_approx returns an actual data value (nearest rank),
    // not the interpolated cut, so boundaries may shift by one
    // position — assert the properties that matter: buckets are
    // monotone in score and tercile-sized within that shift.
    val docs = (0 until 30)
      .map(i => (i.toLong, Seq.fill(i + 1)(s"w$i").mkString(" "), if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.logFreqBuckets(docs, "doc_id", "text", "lang",
        exactThresholds = false)
      .select("lang", "logfreq_score", "bucket")
      .as[(String, Double, Long)].collect()
    Seq("en", "de").foreach { s =>
      val rows = got.filter(_._1 == s).sortBy(_._2)
      assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq, s"non-monotone in $s")
      (0L to 2L).foreach { b =>
        val n = rows.count(_._3 == b)
        assert(math.abs(n - 5) <= 2, s"stratum $s bucket $b size $n")
      }
    }
  }

  test("repetitionStats: hand-computed dup ratios and max-token share") {
    import spark.implicits._
    val docs = Seq(
      // tokens: [a b a b a] → 3-grams: "a b a","b a b","a b a" (3 total, 2 distinct)
      (1L, "a b a b a"),
      // no repetition at all
      (2L, "u v w x"),
      // degenerate loop output: one token repeated
      (3L, "spam spam spam spam"),
      // too short for any 3-gram
      (4L, "xy zz")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1L) === ((5L, 3L, math.rint((1.0 - 2.0 / 3) * 1e6) / 1e6, 0.6, 0.6)))
    assert(got(2L) === ((4L, 2L, 0.0, 0.0, 0.25)))
    assert(got(3L) === ((4L, 2L, 0.5, 0.75, 1.0)))
    assert(got(4L) === ((2L, 0L, 0.0, 0.0, 0.5)))
  }

  test("repetition_counts kernel: SQL split semantics (empties kept) on odd spacing") {
    import spark.implicits._
    // "a  b " splits to [a, "", b, ""]: 4 tokens, 3 distinct, max mult 2
    // ("" twice); 2 shingles "a  b" and " b " — distinct
    val r = TextAnalysis.repetitionStats(Seq((1L, "a  b ")).toDF("doc_id", "text"),
      "doc_id", "text").head
    assert(r.getLong(1) === 4L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.0)                     // both shingles distinct
    assert(r.getDouble(4) === 0.25)                    // 1 - 3/4
    assert(r.getDouble(5) === 0.5)                     // "" appears twice
    // cross-check the token count against Spark's own split()
    val sparkSplit = Seq(("a  b ")).toDF("text")
      .select(size(split(col("text"), " "))).head.getInt(0)
    assert(sparkSplit === 4)
  }

  test("repetitionStats: empty text does not divide by zero") {
    import spark.implicits._
    val r = TextAnalysis.repetitionStats(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head
    // split("", " ") = [""] → 1 token, 0 shingles, max share 1.0
    assert(r.getLong(1) === 1L && r.getLong(2) === 0L)
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0 && r.getDouble(5) === 1.0)
  }

  test("chunkTokens: windows, stride, tail handling, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: starts 0,3,6 — start 6 reaches the end (6+4 >= 10), so 3 chunks
    assert(got.count(_._1 == 1L) === 3)
    assert(got(0) === ((1L, 0L, 4L, "t1 t2 t3 t4")))
    assert(got(1) === ((1L, 1L, 4L, "t4 t5 t6 t7")))
    assert(got(2) === ((1L, 2L, 4L, "t7 t8 t9 t10")))
    // doc 2 shorter than one window: exactly one (short) chunk
    assert(got(3) === ((2L, 0L, 2L, "a b")))
  }

  test("chunkTokens: every token is covered and consecutive chunks overlap by chunk-stride") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 103).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 16, stride = 12)
      .orderBy("chunk_id").collect().map(_.getString(3).split(" ").toSeq)
    assert(chunks.flatten.distinct.length === 103) // full coverage
    for (pair <- chunks.sliding(2)) {
      assert(pair(0).takeRight(4) === pair(1).take(4)) // overlap = 16 - 12
    }
    assert(chunks.last.last === "w103")
  }

  test("vocabCoverage: OOV fractions with a deterministic tie at the vocab cut") {
    import spark.implicits._
    // counts: aa=4, bb=3, cc=3, dd=1 — vocabSize=2 cuts {aa, bb}
    // (bb beats cc on the term tie-break at equal count 3)
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa aa bb bb cc cc dd")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 1L, 0.25)))             // cc OOV
    assert(got(2L) === ((7L, 3L, math.rint(3.0 / 7 * 1e6) / 1e6))) // cc,cc,dd OOV
  }

  test("vocabCoverage plan: vocab cut is a heap top-k and the probe join broadcasts") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no heap vocab cut in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"vocab not broadcast in:\n$plan")
  }

  test("repetitionStats is a single shuffle-free projection (plan)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("bucketDrift: identical distributions → zero contributions") {
    import spark.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong, Seq.fill(i % 4 * 10 + 5)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bucketDrift(docs, docs, "text").orderBy("bucket").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2))     // n_old == n_new
      assert(r.getDouble(3) === 0.0)            // (n_new - e)²/e with e = n_new
    }
  }

  test("bucketDrift: hand-computed chi-square contribution and null expectation") {
    import spark.implicits._
    // old: 2 docs in bucket 0; new: 1 doc bucket 0 + 1 doc bucket 2
    val old = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val neu = Seq((3L, "a b c"), (4L, Seq.fill(25)("w").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.bucketDrift(old, neu, "text").orderBy("bucket").collect()
    // bucket 0: e = 2·(2/2) = 2, contrib = (1-2)²/2 = 0.5
    assert(got(0).getLong(0) === 0L && got(0).getDouble(3) === 0.5)
    // bucket 2: unseen in old → null contribution, row still present
    assert(got(1).getLong(0) === 2L && got(1).getLong(1) === 0L &&
      got(1).getLong(2) === 1L && got(1).isNullAt(3))
  }

  test("readability: hand-computed Flesch on a known sentence pair") {
    import spark.implicits._
    // "The cat sat. It ran away!" → 2 sentences, 6 words,
    // vowel groups: e,a,a,i,a,a,ay → the|1 cat|1 sat|1 it|1 ran|1 away|2 = 7
    val got = TextAnalysis.readability(
      Seq((1L, "The cat sat. It ran away!")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(got.getLong(1) === 2L) // sentences
    assert(got.getLong(2) === 6L) // words
    assert(got.getLong(3) === 7L) // syllable groups
    val wps = 6.0 / 2.0
    val spw = 7.0 / 6.0
    assert(got.getDouble(4) === wps)
    assert(got.getDouble(5) === spw)
    assert(got.getDouble(6) === 206.835 - 1.015 * wps - 84.6 * spw)
    assert(got.getDouble(7) === 0.39 * wps + 11.8 * spw - 15.59)
  }

  test("langConfusion: diagonal for marker-bearing docs, tie-break routes zero-hit docs to en") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and the dog"),
      ("de", "der hund und die katze"),
      ("zh", "xx yy zz")). // no Latin markers → all-zero hits → 'en' tie-break
      toDF("lang", "text")
    val got = TextAnalysis.langConfusion(docs, "lang", "text")
      .orderBy("lang_true").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("de", "de", 1L), ("en", "en", 1L), ("zh", "en", 1L)))
  }

  test("sourceWilson: hand-computed bound; 3/3 ranks below 960/1000") {
    import spark.implicits._
    val docs = (1 to 3).map(i => ("tiny", 300L)) ++
      (1 to 1000).map(i => ("big", if (i <= 960) 300L else 10L))
    val got = TextAnalysis.sourceWilson(docs.toDF("source", "n_chars"),
      "source", col("n_chars") >= 200).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    val (n1, k1, w1) = got("tiny")
    val (n2, k2, w2) = got("big")
    assert((n1, k1) === ((3L, 3L)) && (n2, k2) === ((1000L, 960L)))
    // p̂(tiny)=1.0 > p̂(big)=0.96, but the bound must flip the order
    assert(w1 < w2)
    // hand-computed Wilson lower bound for k=3, n=3, z=1.96
    val z = 1.96; val p = 1.0; val nd = 3.0
    val expect = (p + z * z / (2.0 * nd) -
      z * math.sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd))) /
      (1.0 + z * z / nd)
    assert(math.abs(w1 - expect) < 1e-12)
  }

  test("readability: punctuation-free text clamps sentences to 1; empty text to 1 word") {
    import spark.implicits._
    val got = TextAnalysis.readability(
      Seq((1L, "no terminal punctuation here"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 1L && got(0).getLong(2) === 4L)
    assert(got(1).getLong(1) === 1L && got(1).getLong(2) === 1L &&
      got(1).getLong(3) === 0L)
  }

  test("scriptMix: hand counts per block, dominant with declared tie order, none on empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello мир"),       // latin 5, cyrillic 3 -> latin
      (2L, "абв abc"),         // tie 3-3 -> latin (declared order)
      (3L, "漢字 123 4"),       // cjk 2, digit 4 -> digit
      (4L, ""),                // none
      (5L, "Ωμέγα"),           // greek only
      (6L, "١٢٣ नमस")          // arabic 3, devanagari 3 -> arabic (order)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def dom(i: Int) = out(i).getAs[String]("dominant")
    assert(out(0).getAs[Long]("n_latin") === 5L)
    assert(out(0).getAs[Long]("n_cyrillic") === 3L)
    assert(dom(0) === "latin")
    assert(dom(1) === "latin") // tie resolves by declared order
    assert(out(2).getAs[Long]("n_cjk") === 2L)
    assert(out(2).getAs[Long]("n_digit") === 4L)
    assert(dom(2) === "digit")
    assert(dom(3) === "none")
    assert(dom(4) === "greek")
    assert(out(5).getAs[Long]("n_arabic") === 3L)
    assert(out(5).getAs[Long]("n_devanagari") === 3L)
    assert(dom(5) === "arabic")
  }

  test("languageSegments: code-switch runs collapse to labeled segments") {
    import spark.implicits._
    // 8 en-marker tokens, 8 de, 8 fr, then 8 en again: 4 segments,
    // aligned on the block grid
    val doc = Seq.fill(2)("the a and of").mkString(" ") + " " +
      Seq.fill(2)("der die das und").mkString(" ") + " " +
      Seq.fill(2)("le la les et").mkString(" ") + " " +
      Seq.fill(2)("the a and of").mkString(" ")
    val got = TextAnalysis.languageSegments(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("seg_id")
      .collect().map(r => (r.getAs[Long]("seg_id"), r.getAs[String]("lang"),
        r.getAs[Long]("first_block"), r.getAs[Long]("n_blocks")))
    assert(got.toSeq === Seq(
      (0L, "en", 0L, 1L), (1L, "de", 1L, 1L),
      (2L, "fr", 2L, 1L), (3L, "en", 3L, 1L)))
  }

  test("languageSegments: tie order en>de>fr>es; deterministic under repartition") {
    import spark.implicits._
    // a block with zero markers ties 0-0-0-0 -> 'en' by the fixed order
    val df = Seq((1L, "xyz qqq www eee rrr ttt yyy uuu")).toDF("doc_id", "text")
    val one = TextAnalysis.languageSegments(df, "doc_id", "text").collect()
    assert(one.length === 1 && one.head.getAs[String]("lang") === "en")
    val many = (0L until 40L).map(i =>
      (i, ("w " * (i % 30 + 1).toInt).trim + " der die das und"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.languageSegments(many, "doc_id", "text")
      .orderBy("id", "seg_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.languageSegments(many.repartition(7), "doc_id", "text")
      .orderBy("id", "seg_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("collocations: exclusive bonds outrank diluted pairs; ties break asc") {
    import spark.implicits._
    // (cat, sat) and (sat, on) are exclusive bonds of 40-count terms;
    // "the" appears twice per doc so (the, cat)'s lift halves, and
    // "new"/"york" appear 80 times so (new, york) halves too — PMI
    // rewards exclusivity, not raw frequency
    val docs = (1L to 40L).map { i =>
      val filler = s"the w$i the cat sat on w${i + 1}"
      (i, s"new york $filler new york")
    }.toDF("id", "text")
    val r = TextAnalysis.collocations(docs, "id", "text", minCount = 5, k = 10)
      .orderBy("rnk").collect()
    val ranked = r.map(x => (x.getString(0), x.getString(1))).toSeq
    assert(ranked.take(2) === Seq(("cat", "sat"), ("sat", "on")))
    val lift = r.map(x =>
      (x.getString(0), x.getString(1)) -> x.getLong(5)).toMap
    assert(lift(("cat", "sat")) === lift(("sat", "on"))) // tie, asc order
    assert(lift(("new", "york")) === lift(("the", "cat")))
    assert(lift(("new", "york")) < lift(("cat", "sat")))
    // equal-lift tie breaks on term pair asc
    assert(ranked.indexOf(("new", "york")) < ranked.indexOf(("the", "cat")))
    // every emitted pair respects the min count and rnk is dense
    assert(r.forall(_.getLong(2) >= 5L))
    assert(r.map(_.getLong(6)).toSeq === (1L to r.length))
  }

  test("collocations: empty and 1-token docs contribute no pairs, no crash") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "solo"), (3L, null.asInstanceOf[String])) ++
      (4L to 20L).map(i => (i, "x y"))
    val r = TextAnalysis.collocations(docs.toDF("id", "text"), "id", "text",
      minCount = 5, k = 5).collect()
    assert(r.length === 1)
    assert((r.head.getString(0), r.head.getString(1)) === (("x", "y")))
    assert(r.head.getLong(2) === 17L)
  }

  test("collocations: deterministic across partitionings; lift exact") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, "a b a b c d")).toDF("id", "text")
    val one = TextAnalysis.collocations(docs.repartition(1), "id", "text",
      minCount = 2, k = 5).collect().toSeq
    val many = TextAnalysis.collocations(docs.repartition(11), "id", "text",
      minCount = 2, k = 5).collect().toSeq
    assert(one === many)
    // hand-check one lift: tokens per doc = 6 -> N = 360, bigrams per
    // doc = 5 -> B = 300. c(a,b): "a b" twice per doc = 120;
    // c(a) = 120, c(b) = 120. lift = 120*360*360*1e6/(300*120*120)
    val ab = one.find(x => x.getString(0) == "a" && x.getString(1) == "b").get
    val want = (BigInt(120) * 360 * 360 * 1000000) / (BigInt(300) * 120 * 120)
    assert(ab.getLong(5) === want.toLong)
  }

  test("saturationCurve: repeats stop being new; counts exact") {
    import spark.implicits._
    // ids 0..99 in 10 buckets; buckets 0-4 all share one text (one
    // 3-gram after the first bucket is no longer new), buckets 5-9
    // each introduce a per-bucket gram
    val docs = (0L until 100L).map { i =>
      val b = i / 10
      if (b < 5) (i, "a b c d")     // grams: "a b c", "b c d"
      else (i, s"x$b y$b z$b")      // one new gram per bucket
    }.toDF("id", "text")
    val r = TextAnalysis.saturationCurve(docs, "id", "text", n = 3)
      .orderBy("bucket").collect()
    assert(r.length === 10)
    assert(r(0).getLong(1) === 2L && r(0).getLong(2) === 2L) // both new
    for (b <- 1 to 4) {
      assert(r(b).getLong(1) === 2L, s"bucket $b n_grams")
      assert(r(b).getLong(2) === 0L, s"bucket $b new")  // all repeats
      assert(r(b).getLong(4) === 0L)                    // novelty 0
    }
    for (b <- 5 to 9) {
      assert(r(b).getLong(1) === 1L && r(b).getLong(2) === 1L)
      assert(r(b).getLong(4) === 1000000L)              // fully novel
    }
    assert(r(9).getLong(3) === 2L + 5L) // cumulative distinct grams
  }

  test("saturationCurve: short and empty docs contribute no grams") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (5L, ""), (10L, null.asInstanceOf[String])) ++
      (20L to 99L).map(i => (i, "p q r s"))
    val r = TextAnalysis.saturationCurve(docs.toDF("id", "text"), "id", "text")
      .orderBy("bucket").collect()
    // buckets 0/1 hold only short docs -> absent (no grams at all)
    assert(r.forall(_.getLong(1) > 0L))
    assert(r.map(_.getLong(2)).sum === 2L) // "p q r", "q r s" once each
  }

  test("saturationCurve: deterministic across partitionings") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"w${i % 37} q${i % 11} r s t"))
      .toDF("id", "text")
    val a = TextAnalysis.saturationCurve(docs.repartition(1), "id", "text")
      .orderBy("bucket").collect().toSeq
    val b = TextAnalysis.saturationCurve(docs.repartition(13), "id", "text")
      .orderBy("bucket").collect().toSeq
    assert(a === b)
  }

  test("burstiness: clumped term high VMR, uniform term zero") {
    import spark.implicits._
    // 4 docs; "the" once everywhere (VMR 0); "x" four times in one doc:
    // N·Σx² − cf² = 4·16 − 16 = 48 → 1e6·48 div (4·4) = 3000000
    val docs = Seq(
      (1L, "the x x x x"), (2L, "the"), (3L, "the"), (4L, "the"))
      .toDF("id", "text")
    val got = TextAnalysis.termBurstiness(docs, "id", "text", k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("the") === ((4L, 4L, 0L)))
    assert(got("x") === ((1L, 4L, 3000000L)))
  }

  test("lexical concentration: Yule's K and Simpson repeat-rate exact") {
    import spark.implicits._
    // "a a a b b c": N=6, S2=14, rep=8 → K = 1e7·8/36, λ = 1e6·8/30
    val docs = Seq(("x", "a a a b b c"), ("y", "a b c")).toDF("g", "text")
    val got = TextAnalysis.lexicalConcentration(docs, "g", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("x") === ((3L, 6L, 2222222L, 266666L)))
    assert(got("y") === ((3L, 3L, 0L, 0L)))
  }

  test("hapax: rate separates varied prose from repeated template") {
    import spark.implicits._
    val docs = Seq(
      ("fresh", "alpha beta gamma delta alpha"), // types 4, hapax 3
      ("tmpl", "buy now buy now buy now"))       // types 2, hapax 0
      .toDF("g", "text")
    val got = TextAnalysis.hapaxRate(docs, "g", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("fresh") === ((4L, 5L, 3L, 750000L)))
    assert(got("tmpl") === ((2L, 6L, 0L, 0L)))
  }

  test("textRankTerms: hub term outranks leaves on a star graph") {
    import spark.implicits._
    // every doc links a distinct leaf to the hub term "central":
    // the co-occurrence graph is a star and PageRank must rank the
    // hub first; short tokens are filtered out of candidacy
    val docs = (1 to 8).map(i => s"leaf$i central ok").toDF("text")
    val rows = TextAnalysis.textRankTerms(docs, "text", k = 20)
      .collect()
    assert(rows.head.getString(0) === "central")
    assert(!rows.map(_.getString(0)).exists(_ == "ok")) // len 2 < 4
    // descending rank, ties by term
    val keys = rows.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sortBy(identity).toSeq === keys.toSeq)
  }

  test("textRankTerms: single-token and null docs are safe") {
    import spark.implicits._
    val docs = Seq("solo", null, "alpha beta alpha").toDF("text")
    val rows = TextAnalysis.textRankTerms(docs, "text", k = 5)
      .collect().map(_.getString(0)).toSet
    assert(rows === Set("alpha", "beta"))
  }

  test("zipfFit: a 1/rank corpus fits slope -1 with high r2") {
    import spark.implicits._
    // term r appears floor(2000/r) times: log cnt = log 2000 - log r
    val words = (1 to 40).flatMap(r => Seq.fill(2000 / r)(s"term$r"))
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val row = TextAnalysis.zipfFit(docs, "text").collect().head
    assert(row.getAs[Long]("n_types") === 40L)
    val slope = row.getAs[Double]("slope")
    val r2 = row.getAs[Double]("r2")
    assert(slope > -1.05 && slope < -0.95, s"slope=$slope")
    assert(r2 > 0.99, s"r2=$r2")
    // a uniform corpus has slope ~ 0
    val flat = (1 to 40).flatMap(r => Seq.fill(50)(s"u$r"))
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val fr = TextAnalysis.zipfFit(flat, "text").collect().head
    assert(math.abs(fr.getAs[Double]("slope")) < 0.05)
  }

  test("heapsFit: sub-linear vocab growth on Zipfian text, sane on tiny input") {
    import spark.implicits._
    // Zipfian-ish corpus: new types keep arriving but ever more slowly
    val words = (1 to 5000).map(i => s"t${(math.sqrt(i)).toInt}")
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val r = TextAnalysis.heapsFit(
      docs.selectExpr("monotonically_increasing_id() AS id", "text"),
      "id", "text").collect().head
    val beta = r.getAs[Double]("beta")
    // V(N) = sqrt(N) exactly here → beta ≈ 0.5 with near-perfect fit
    assert(beta > 0.4 && beta < 0.6, s"beta=$beta")
    assert(r.getAs[Double]("r2") > 0.98)
    assert(r.getAs[Long]("n_points") >= 8L)
  }

  test("spearman: monotone ±1, hand-computed tie correction") {
    import spark.implicits._
    def rho(rows: Seq[(Long, Long)]): Double =
      TextAnalysis.spearman(rows.toDF("x", "y"), "x", "y")
        .collect().head.getDouble(1)
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L))) === 1.0)
    assert(rho(Seq((1L, 30L), (2L, 20L), (3L, 10L))) === -1.0)
    // any monotone transform leaves rho untouched (rank invariance)
    assert(rho(Seq((1L, 1L), (2L, 100L), (3L, 101L))) === 1.0)
    // ties: x=[1,2,2,3], y=[1,3,2,4] → doubled avg ranks u=[2,5,5,8],
    // v=[2,6,4,8]: num 72, denoms 72·80 → 72/√5760 = 0.948683
    assert(rho(Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L))) === 0.948683)
  }

  test("adjacent_token_pairs kernel ≡ the double-Generate HOF formulation") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val fixtures = Seq("", " ", "one two three", "aaaa aaaa", "aaaa bbbb aaaa",
      "ab cd", "héllo wörld héllo", "long enough words here", "x  yyyy zzzz ")
    val df = fixtures.toDF("text")
    val toks = split(col("text"), " ")
    val hof = df
      .filter(size(toks) >= 2)
      .select(col("text"), toks.as("__t"),
        explode(sequence(lit(1), size(toks) - 1)).as("__i"))
      .select(col("text"), element_at(col("__t"), col("__i")).as("a"),
        element_at(col("__t"), col("__i") + 1).as("b"))
      .filter(length(col("a")) >= 4 && length(col("b")) >= 4 &&
        col("a") =!= col("b"))
      .select(col("text"), explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("text"), col("e.src"), col("e.dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val kernel = df
      .select(col("text"),
        explode(GraftFunctions.adjacentTokenPairs(col("text"), 4)).as("e"))
      .select(col("text"), col("e.src"), col("e.dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    fixtures.foreach { s =>
      assert(kernel.getOrElse(s, Seq.empty) === hof.getOrElse(s, Seq.empty),
        s"text '$s'")
    }
  }

  test("tokenEntropy: hand-computed uniform and skewed corpora") {
    import spark.implicits._
    // uniform 4 tokens → H = 2 bits exactly; V = 4 → max = 2 bits
    val uni = Seq("a b", "c d").toDF("text")
    val r = TextAnalysis.tokenEntropy(uni, "text").collect().head
    assert((r.getLong(0), r.getLong(1)) === (4L, 4L))
    assert(r.getLong(2) === 2000000L)
    assert(r.getLong(3) === 2000000L)
    // all-same token → H = 0
    val same = Seq("x x x x").toDF("text")
    val r2 = TextAnalysis.tokenEntropy(same, "text").collect().head
    assert(r2.getLong(2) === 0L)
    assert(r2.getLong(1) === 1L)
  }
}
