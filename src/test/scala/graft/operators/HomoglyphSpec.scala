package graft.operators

import graft.SparkFunSuite

/** Homoglyph skeletons + spoof detection, and the recrawl backoff
  * schedule (both crawl-policy cards added in round 9). */
class HomoglyphSpec extends SparkFunSuite {
  import spark.implicits._

  test("skeleton: cyrillic/greek/digit confusables collapse, others pass") {
    assert(Homoglyph.skeleton("fаlcon.example") === "falcon.example")
    assert(Homoglyph.skeleton("fa1con.example") === "falcon.example")
    assert(Homoglyph.skeleton("gοοgle.test") === "google.test")
    assert(Homoglyph.skeleton("plain-ascii.example") === "plain-ascii.example")
    assert(Homoglyph.skeleton("") === "" && Homoglyph.skeleton(null) === "")
    // digits legitimately in names DO skeletonize (paypa1 -> paypal is
    // the point); detection only fires when the skeleton EXISTS
    assert(Homoglyph.skeleton("web20.example") === "web2o.example")
  }

  test("skeleton: fullwidth / math-alphanumeric / enclosed / armenian classes") {
    // fullwidth ASCII mirror (U+FF01..FF5E): ｅｘａｍｐｌｅ -> example
    assert(Homoglyph.skeleton("ｅｘａｍｐｌｅ")
      === "example")
    // fullwidth capitals lowercase (hosts are normalized lowercase)
    assert(Homoglyph.skeleton("ＥＸ") === "ex")
    // fullwidth digits chain through the digit substitutions: ０ -> 0 -> o
    assert(Homoglyph.skeleton("０１") === "ol")
    // math sans-serif 𝖾𝗑𝖺𝗆𝗉𝗅𝖾 (supplementary plane; style offset 8*52)
    val mathSans = "example".map(c =>
      new String(Character.toChars(0x1D400 + 8 * 52 + 26 + (c - 'a')))).mkString
    assert(Homoglyph.skeleton(mathSans) === "example")
    // math bold capitals 𝐄𝐗 -> ex; math monospace digit 𝟽 -> 7
    assert(Homoglyph.skeleton(
      new String(Character.toChars(0x1D404)) +
        new String(Character.toChars(0x1D417))) === "ex")
    assert(Homoglyph.skeleton(new String(Character.toChars(0x1D7FD))) === "7")
    // math double-struck zero 𝟘 resolves transitively: -> '0' -> 'o'
    assert(Homoglyph.skeleton(new String(Character.toChars(0x1D7D8))) === "o")
    // enclosed: Ⓐⓐ⒜ all -> a
    assert(Homoglyph.skeleton("Ⓐⓐ⒜") === "aaa")
    // armenian: հոսt -> host (h/n/... wait: հ->h ո->n) — sequential vector
    assert(Homoglyph.skeleton("հost.example") === "host.example")
    assert(Homoglyph.skeleton("aոb") === "anb")
    // kelvin sign + letterlike
    assert(Homoglyph.skeleton("Kℓℯ") === "kle")
    // the whole table is idempotent: skeleton(skeleton(x)) == skeleton(x)
    for ((cp, a) <- Homoglyph.Table) {
      assert(a >= 0x21 && a <= 0x7E, f"non-ASCII target for U+$cp%04X: $a")
      val s = Homoglyph.skeleton(new String(Character.toChars(cp)))
      assert(Homoglyph.skeleton(s) === s, f"not idempotent at U+$cp%04X")
    }
  }

  test("spoofCandidates: flags only domains whose skeleton is another domain") {
    val domains = Seq(
      "falcon.example",          // legit target
      "fаlcon.example",     // cyrillic spoof -> flagged
      "fa1con.example",          // digit spoof -> flagged
      "web20.example",           // skeletonizes, but web2o doesn't exist
      "unrelated.example").toDF("domain")
    val got = Homoglyph.spoofCandidates(domains, "domain")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(got("falcon.example") === false)
    assert(got("fаlcon.example") === true)
    assert(got("fa1con.example") === true)
    assert(got("web20.example") === false)
    assert(got("unrelated.example") === false)
    // duplicates in the input collapse (distinct domains out)
    val dup = Homoglyph.spoofCandidates(
      (domains.as[String].collect().toSeq ++ Seq("falcon.example"))
        .toDF("domain"), "domain")
    assert(dup.count() === 5)
  }

  test("recrawlSchedule: backoff doubles with the stable run, capped") {
    val fetches = for {
      page <- Seq(1L, 2L, 3L)
      idx <- 0L until 6L
    } yield {
      // page 1 changes every fetch; page 2 stops changing at idx 2;
      // page 3 never changes after fetch 0
      val fp = page match {
        case 1L => s"v$idx"
        case 2L => s"v${math.min(idx, 2L)}"
        case _ => "v0"
      }
      (page, idx, fp, 1000L + page)
    }
    val got = Frontier.recrawlSchedule(
      fetches.toDF("page", "idx", "fp", "ts"), "page", "idx", "fp", "ts",
      baseIntervalS = 100L, maxIntervalS = 2000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((0L, 100L, 1101L)))   // changed last fetch
    assert(got(2L) === ((3L, 800L, 1802L)))   // 3 stable -> 100*8
    assert(got(3L) === ((5L, 2000L, 3003L)))  // 100*32 capped at 2000
  }

  test("recrawlSchedule: deterministic under repartition; overflow guard") {
    val fetches = (0L until 40L).flatMap(p =>
      (0L until 8L).map(i => (p, i, s"f${math.min(i, p % 8)}", p)))
      .toDF("page", "idx", "fp", "ts")
    val a = Frontier.recrawlSchedule(fetches, "page", "idx", "fp", "ts")
      .orderBy("page").collect().map(_.toSeq).toSeq
    val b = Frontier.recrawlSchedule(fetches.repartition(7),
      "page", "idx", "fp", "ts")
      .orderBy("page").collect().map(_.toSeq).toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Frontier.recrawlSchedule(fetches, "page", "idx", "fp", "ts",
        baseIntervalS = Long.MaxValue >> 3, maxIntervalS = Long.MaxValue >> 2)
    }
  }
}
