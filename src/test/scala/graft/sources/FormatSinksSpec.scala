package graft.sources

import graft.SparkFunSuite

class FormatSinksSpec extends SparkFunSuite {
  import spark.implicits._

  test("CSV/JSON/ORC roundtrips are lossless on hostile strings") {
    val df = Seq(
      (1L, "plain words here", "en", "s0"),
      (2L, "comma, \"quoted\", and 'single'", "en", "s1"),
      (3L, "unicode ä ß 中文 → ok", "de", "s0"),
      (4L, "trailing space ", "fr", "s2"),
      (5L, "semi;colon\tand tab", "es", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_spec").toString
    val rows = FormatSinks.roundtripSummary(df, Seq("csv", "json", "orc"), dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = {
      val total = df.collect().map(_.getString(1).length.toLong).sum
      (5L, 5L, total, 15L)
    }
    assert(rows.map(_._1).toSeq === Seq("csv", "json", "orc"))
    for (r <- rows)
      assert((r._2, r._3, r._4, r._5) === expected, s"format ${r._1} not lossless")
  }

  test("explicit schema keeps integer types exact (no inference drift)") {
    val df = Seq((Long.MaxValue - 1, "big id doc", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_spec2").toString
    val rows = FormatSinks.roundtripSummary(df, Seq("csv", "json"), dir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows("csv") === Long.MaxValue - 1)
    assert(rows("json") === Long.MaxValue - 1)
  }
}
