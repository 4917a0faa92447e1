package graft.operators

import graft.SparkFunSuite

/** MLM corruption: determinism, mask-rate sanity, input/target
  * consistency, and exact reconstruction. */
class ObjectivePrepSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 200).map(i => s"w$i").mkString(" ")),
    (2L, "single"),
    (3L, "a b c d e f g h i j")
  ).toDF("doc_id", "text")

  test("deterministic under repartitioning; mask rate near 1/7") {
    val a = ObjectivePrep.mlmCorruption(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = ObjectivePrep.mlmCorruption(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val r = a.head
    val rate = r.getAs[Long]("n_masked").toDouble / r.getAs[Long]("n_tokens")
    assert(rate > 0.05 && rate < 0.30, s"rate $rate") // 200 tokens at 1/7
  }

  test("input and target reconstruct the original text exactly") {
    val rows = ObjectivePrep.mlmCorruption(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val orig = docs.orderBy("doc_id").collect().map(_.getString(1))
    rows.zip(orig).foreach { case (r, text) =>
      val input = r.getAs[String]("input_text").split(" ", -1)
      val target = r.getAs[String]("target_text")
      val targets = if (target.isEmpty) Iterator.empty else target.split(" ", -1).iterator
      val rebuilt = input.map(t => if (t == "[MASK]") targets.next() else t)
      assert(rebuilt.mkString(" ") === text)
      assert(targets.isEmpty) // every target token consumed in order
      assert(input.length === r.getAs[Long]("n_tokens"))
      assert(input.count(_ == "[MASK]") === r.getAs[Long]("n_masked"))
    }
  }

  test("masked positions depend on the doc id (identical texts corrupt differently)") {
    val same = Seq((10L, "x y z " * 50), (11L, "x y z " * 50))
      .toDF("doc_id", "text")
    val got = ObjectivePrep.mlmCorruption(same, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("input_text") !==
      got(1).getAs[String]("input_text"))
  }

  test("fimCorruption: PSM segments partition the tokens; suffix never empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 400L).map(i =>
      (i, (1 to (2 + (i % 9)).toInt).map(k => s"t$k").mkString(" ")))
      .toDF("id", "text")
    val r = ObjectivePrep.fimCorruption(docs, "id", "text").collect()
    r.foreach { row =>
      val (applied, n, pl, ml, sl) = (row.getBoolean(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5))
      if (applied) {
        assert(pl + ml + sl === n, s"partition: $row")
        assert(sl >= 1, s"suffix empty: $row")
        assert(pl >= 0 && ml >= 0)
      } else assert(pl === 0 && ml === 0 && sl === 0)
    }
    // ~half the (n>=3) docs transform
    val eligible = r.filter(_.getLong(2) >= 3)
    val applied = eligible.count(_.getBoolean(1))
    assert(applied > eligible.length / 4 && applied < eligible.length * 3 / 4)
    // n < 3 never transforms
    assert(r.filter(_.getLong(2) < 3).forall(!_.getBoolean(1)))
  }

  test("fimCorruption: transformed text is the exact PSM reordering") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => (i, "a b c d e f g h")).toDF("id", "text")
    val r = ObjectivePrep.fimCorruption(docs, "id", "text")
      .filter(col("fim_applied")).collect()
    assert(r.nonEmpty)
    val toks = "a b c d e f g h".split(" ")
    r.foreach { row =>
      val (pl, ml) = (row.getLong(3).toInt, row.getLong(4).toInt)
      val psm = Seq("<PRE>", toks.take(pl).mkString(" "),
        "<SUF>", toks.drop(pl + ml).mkString(" "),
        "<MID>", toks.slice(pl, pl + ml).mkString(" ")).mkString(" ")
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(psm.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(row.getString(6) === want, s"id=${row.getLong(0)} psm=[$psm]")
    }
  }

  test("fimCorruption: deterministic across partitionings") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, s"w${i} x y z q r")).toDF("id", "text")
    val a = ObjectivePrep.fimCorruption(docs.repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val b = ObjectivePrep.fimCorruption(docs.repartition(13), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("ictPairs: query removed from context unless kept; singles drop") {
    import spark.implicits._
    val segs = Seq(
      // doc 1: three segments; doc 2: single segment (must vanish)
      (1L, 0L, "alpha beta"), (1L, 1L, "gamma delta"), (1L, 2L, "eps zeta"),
      (2L, 0L, "lonely")) ++
      (10L to 120L).flatMap(i => Seq((i, 0L, s"a$i"), (i, 1L, s"b$i"),
        (i, 2L, s"c$i")))
    val rows = ObjectivePrep.ictPairs(segs.toDF("id", "seg_idx", "seg_text"),
      "id", "seg_idx", "seg_text", keepOneIn = 10).collect()
    assert(!rows.map(_.getLong(0)).contains(2L))
    val texts = Map(0L -> "alpha beta", 1L -> "gamma delta", 2L -> "eps zeta")
    rows.foreach { r =>
      val (id, n, qi, keep, qt, ctx) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3), r.getString(4), r.getString(5))
      assert(qi >= 0 && qi < n, s"id=$id qi=$qi n=$n")
      if (id == 1L) {
        assert(qt === texts(qi))
        val expect = (0L to 2L)
          .filter(i => i != qi || keep).map(texts).mkString(" ")
        assert(ctx === expect)
      }
      // the kept flag controls membership everywhere
      if (keep) assert(ctx.contains(qt))
    }
    // some keeps and some removals across 112 docs (1-in-10 rate)
    val keeps = rows.count(_.getBoolean(3))
    assert(keeps > 0 && keeps < rows.length)
  }

  test("ictPairs: deterministic across partitionings") {
    import spark.implicits._
    val segs = (1L to 200L).flatMap(i =>
      (0L until 1L + i % 4).map(j => (i, j, s"s$i-$j")))
      .toDF("id", "seg_idx", "seg_text")
    val a = ObjectivePrep.ictPairs(segs.repartition(1), "id", "seg_idx",
      "seg_text").orderBy("id").collect().toSeq
    val b = ObjectivePrep.ictPairs(segs.repartition(17), "id", "seg_idx",
      "seg_text").orderBy("id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
