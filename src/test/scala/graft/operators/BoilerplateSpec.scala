package graft.operators

import graft.SparkFunSuite

class BoilerplateSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val pages = Seq(
    (1L, "g1", "HEADER\nbody one\nFOOT"),
    (2L, "g1", "HEADER\nbody two\nFOOT"),
    (3L, "g1", "HEADER\nbody three\nFOOT"),
    (4L, "g1", "HEADER\nbody one\nEXTRA"), // dup body: only 2 docs → kept
    (5L, "g2", "HEADER\nlonely\nFOOT")     // g2: 1 doc → nothing removed
  ).toDF("doc_id", "grp", "page")

  test("lines recurring in >= minDocs distinct docs of a group are flagged") {
    val b = Boilerplate.boilerplateLines(pages, "doc_id", "grp", "page", 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // HEADER in 4 distinct g1 docs, FOOT in 3; "body one" only 2 (doc 1 + 4)
    assert(b === Set(("g1", "HEADER"), ("g1", "FOOT")))
  }

  test("removal preserves line order and only touches the offending group") {
    val out = Boilerplate.removeBoilerplate(pages, "doc_id", "grp", "page", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((3L, 2L, md5hex("body one"))))
    assert(out(4L) === ((3L, 1L, md5hex("body one\nEXTRA"))))
    // g2 has only one doc — its HEADER/FOOT are not boilerplate there
    assert(out(5L) === ((3L, 0L, md5hex("HEADER\nlonely\nFOOT"))))
  }

  test("duplicate lines WITHIN one doc count that doc once") {
    val p = Seq(
      (1L, "g", "X\na\nX"), (2L, "g", "X\nb"), (3L, "g", "c\nd")
    ).toDF("doc_id", "grp", "page")
    // X appears in 2 distinct docs (1 twice, 2 once) → below minDocs=3
    val b = Boilerplate.boilerplateLines(p, "doc_id", "grp", "page", 3).count()
    assert(b === 0L)
  }

  test("a fully-boilerplate document fingerprints the empty string") {
    val p = Seq(
      (1L, "g", "SAME"), (2L, "g", "SAME"), (3L, "g", "SAME")
    ).toDF("doc_id", "grp", "page")
    val out = Boilerplate.removeBoilerplate(p, "doc_id", "grp", "page", 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === md5hex(""))
  }

  test("results are partitioning-invariant") {
    val p = (0L until 40L).map(i =>
      (i, s"g${i % 3}", s"HEAD g${i % 3}\nbody $i\nrare ${i % 20}"))
      .toDF("doc_id", "grp", "page")
    val a = Boilerplate.removeBoilerplate(p.repartition(7), "doc_id", "grp", "page", 3)
      .orderBy("doc_id").collect().toSeq
    val b = Boilerplate.removeBoilerplate(p.repartition(2), "doc_id", "grp", "page", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
