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
}
