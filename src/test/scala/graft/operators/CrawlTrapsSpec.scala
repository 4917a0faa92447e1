package graft.operators

import graft.SparkFunSuite

/** URL templating and trap amplification: the three classic trap
  * shapes, boundary rules of the hex/digit collapse, totality. */
class CrawlTrapsSpec extends SparkFunSuite {
  import spark.implicits._

  test("template: digit runs, hex runs, and query values collapse") {
    assert(CrawlTraps.template("https://cal.example/events/2024/3/17")
      === "cal.example/events/N/N/N")
    assert(CrawlTraps.template("https://shop.example/s/deadbeef01/item")
      === "shop.example/s/H/item")
    // exactly-8 hex collapses; 7 hex chars do NOT (they are a word)
    assert(CrawlTraps.template("https://a.example/x/abcdef12/y")
      === "a.example/x/H/y")
    assert(CrawlTraps.template("https://a.example/x/abcdef1/y")
      === "a.example/x/abcdefN/y")
    // query: values dropped, keys sorted
    assert(CrawlTraps.template("https://t.example/p?session=99&page=3")
      === "t.example/p?page,session")
    // a digits-only run of 8+ is caught by the hex rule first — same H
    assert(CrawlTraps.template("https://a.example/v/12345678/z")
      === "a.example/v/H/z")
  }

  test("template: totality — garbage and null return themselves/empty") {
    assert(CrawlTraps.template(null) === "")
    assert(CrawlTraps.template("not a url") === "not a url")
    assert(CrawlTraps.template("https://ok.example/plain") === "ok.example/plain")
  }

  test("trapScores: a generated URL space is flagged, a real site is not") {
    val urls = ((0 until 40).map(i => s"https://trap.example/cal/2024/$i") ++
      Seq("https://real.example/about", "https://real.example/contact",
        "https://real.example/products/1"))
      .toDF("url")
    val got = CrawlTraps.trapScores(urls, "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got("trap.example") === ((40L, 1L, 40L, true)))
    // real site: 3 urls, 2 templates (about/contact literal + products/N)
    assert(got("real.example")._4 === false)
    assert(got("real.example")._1 === 3L)
  }

  test("trapScores: duplicate fetches of one URL do not inflate amplification") {
    val urls = Seq.fill(50)("https://dup.example/page/7").toDF("url")
    val got = CrawlTraps.trapScores(urls, "url").collect().head
    assert(got.getLong(1) === 1L && got.getBoolean(4) === false)
  }
}
