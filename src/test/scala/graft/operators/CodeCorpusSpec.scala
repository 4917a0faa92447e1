package graft.operators

import graft.SparkFunSuite

/** License scan: every canonical notice rediscovered as its spdx id,
  * conservative priority on multi-license files, head-bounded probing,
  * unknown on plain text. */
class CodeCorpusSpec extends SparkFunSuite {
  import spark.implicits._

  private def scan(rows: Seq[(Long, String)], headChars: Int = 2000) =
    CodeCorpus.licenseScan(rows.toDF("id", "text"), "id", "text", headChars)
      .orderBy("id").collect()

  test("each canonical notice maps to its spdx id, family and keep verdict") {
    val rows = CodeCorpus.Licenses.zipWithIndex.map { case (l, i) =>
      (i.toLong, s"// some header\n${l._4}\nint main() { return 0; }")
    }
    val out = scan(rows)
    CodeCorpus.Licenses.zipWithIndex.foreach { case ((spdx, family, _, _), i) =>
      assert(out(i).getString(1) === spdx, spdx)
      assert(out(i).getString(2) === family, spdx)
      assert(out(i).getBoolean(3) ===
        (family == "permissive" || family == "public-domain"), spdx)
    }
  }

  test("multi-license files resolve conservatively: GPL + MIT quarantines") {
    val gpl = CodeCorpus.Licenses.find(_._1 == "GPL-3.0").get._4
    val mit = CodeCorpus.Licenses.find(_._1 == "MIT").get._4
    val out = scan(Seq((1L, s"$mit\n$gpl\ncode()")))
    assert(out(0).getString(1) === "GPL-3.0")
    assert(!out(0).getBoolean(3))
  }

  test("notices beyond the head bound are not probed") {
    val mit = CodeCorpus.Licenses.find(_._1 == "MIT").get._4
    val out = scan(Seq((1L, ("x" * 300) + mit)), headChars = 100)
    assert(out(0).getString(1) === "unknown")
  }

  test("plain text is unknown and does not keep") {
    val out = scan(Seq((1L, "the quick brown fox jumps over the lazy dog")))
    assert(out(0).getString(1) === "unknown" &&
      out(0).getString(2) === "unknown" && !out(0).getBoolean(3))
  }

  // ------------------------------------------------------- minified

  test("minifiedStats: single-line dense bundle flags; formatted multi-line does not") {
    import spark.implicits._
    val bundle = "function(){var a=1;b=2;" * 20 // one long line, no ws
    val pretty = (1 to 30).map(i => s"line number $i").mkString("\n")
    val out = CodeCorpus.minifiedStats(
      Seq((1L, bundle), (2L, pretty)).toDF("id", "text"), "id", "text")
      .orderBy("id").collect()
    val b = out(0); val p = out(1)
    assert(b.getAs[Boolean]("minified"))
    assert(b.getAs[Long]("n_lines") === 1L)
    assert(b.getAs[Double]("avg_line") === bundle.length.toDouble)
    assert(!p.getAs[Boolean]("minified"))
    assert(p.getAs[Long]("n_lines") === 30L)
  }

  test("minifiedStats: hand-computed features on a tiny file") {
    import spark.implicits._
    val t = "ab cd\nefgh\n x" // 3 lines: "ab cd", "efgh", " x"
    val r = CodeCorpus.minifiedStats(Seq((1L, t)).toDF("id", "text"),
      "id", "text").collect().head
    assert(r.getAs[Long]("n_chars") === t.length.toLong)
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Long]("max_line") === 5L)
    // chars excluding the 2 newlines = 11, over 3 lines
    assert(math.abs(r.getAs[Double]("avg_line") - 11.0 / 3.0) < 1e-6)
    // whitespace: 2 spaces + 2 newlines = 4 of 13
    assert(math.abs(r.getAs[Double]("ws_ratio") - 4.0 / 13.0) < 1e-6)
  }

  test("minifiedStats: few-line long-line low-ws file trips the second clause") {
    import spark.implicits._
    val t = ("x" * 600) + "\n" + ("y" * 600) + "\n" + ("z" * 600) + "\n" +
      ("w" * 600) // avg 600 > 200 anyway; force clause 2 with smaller avg
    val t2 = ("x" * 501) + "\n" + ("y" * 400) // ws = 1/902 < 0.05
    val r = CodeCorpus.minifiedStats(Seq((1L, t2)).toDF("id", "text"),
      "id", "text", avgLineCap = 10000.0).collect().head
    assert(r.getAs[Long]("max_line") === 501L)
    assert(r.getAs[Boolean]("minified")) // max>500 and ws tiny
    assert(CodeCorpus.minifiedStats(Seq((1L, t)).toDF("id", "text"),
      "id", "text").collect().head.getAs[Boolean]("minified"))
  }

  test("type2: renamed identifiers and changed literals normalize equal") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "def foo(x): if x > 10: return x * 2"),
      (2L, "def bar(total): if total > 999: return total * 7"))
      .toDF("id", "text")
    val forms = df.select(CodeCorpus.type2NormalForm(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(forms.length === 1, forms.toSeq)
  }

  test("type2: keyword and operator changes are NOT clones") {
    import org.apache.spark.sql.functions.col
    val forms = Seq(
      (1L, "if x > 2: y = 1"),
      (2L, "while x > 2: y = 1"),   // keyword differs
      (3L, "if x < 2: y = 1"))      // operator differs
      .toDF("id", "text")
      .select(CodeCorpus.type2NormalForm(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(forms.length === 3, forms.toSeq)
  }

  test("type2: string contents never leak tokens into the form") {
    import org.apache.spark.sql.functions.col
    val forms = Seq(
      (1L, "s = \"if x then 99\""),
      (2L, "s = 'completely different literal'"))
      .toDF("id", "text")
      .select(CodeCorpus.type2NormalForm(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(forms.length === 1, forms.toSeq)
  }

  test("cloneGroups: groups of renamed twins, singletons absent") {
    val docs = Seq(
      (10L, "for i in range(9): acc = acc + i"),
      (20L, "for k in range(42): total = total + k"),
      (30L, "while q < 5: q = q * 3"))
      .toDF("id", "text")
    val rows = CodeCorpus.cloneGroups(docs, "id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((10L, 10L, 2L), (20L, 10L, 2L)))
  }
}
