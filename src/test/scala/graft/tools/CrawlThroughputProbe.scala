package graft.tools

import graft.operators.{CharsetSniff, HtmlExtract, UrlOps}
import graft.sources.WarcCodec

/**
 * Measurement harness behind SCALING.md's crawl-ingest section: the
 * fused read-path task — gunzip → WARC frame → charset sniff+decode →
 * HTML extract → URL canonicalize+resolve — timed per core at growing
 * page volume, the way LSH and the Hamming blocks got their growth
 * tables. The claim under test is "scan-local at 100 TB": per-page
 * cost must be flat as volume grows (no superlinear term anywhere in
 * the chain), which turns the architecture statement into MB/s/core ×
 * cluster cores = corpus wall-clock.
 *
 * Corpus model: deterministic synthetic pages (~8 KB — the crawl
 * median shape) with the structures that cost the extractor real
 * work: script/style blocks with nested fake markup, comments,
 * entity-dense text, ~20 links of every href form, a meta charset on
 * half the pages. Pages are packed into real per-record-gzipped
 * `.warc.gz` shard images via the streaming writer, so the measured
 * path is byte-identical to the production read.
 *
 * Run: sbt "Test/runMain graft.tools.CrawlThroughputProbe"
 */
object CrawlThroughputProbe {

  private val Words = Array(
    "crawl", "corpus", "shard", "filter", "vector", "token", "quality",
    "dedup", "charset", "anchor", "domain", "extract", "parse", "spark",
    "scan", "partition", "signal", "sample", "weight", "bucket")

  /** One deterministic ~8 KB page. */
  def synthPage(id: Long): (String, Array[Byte], String) = {
    val sb = new StringBuilder(9000)
    val meta =
      if (id % 2 == 0) "<meta charset=\"windows-1251\">" else ""
    sb.append("<html><head>").append(meta)
      .append(s"<title>Page $id</title>")
      .append("<script>var cfg = {\"x\": \"<p>not text</p>\", \"y\": 1};</script>")
      .append("<style>.m:before { content: \"<b>no</b>\" }</style></head><body>")
    var w = id
    (0 until 40).foreach { p =>
      sb.append("<p>")
      (0 until 24).foreach { _ =>
        w = w * 6364136223846793005L + 1442695040888963407L
        sb.append(Words(((w >>> 33) % Words.length).toInt)).append(' ')
        if ((w & 63) == 0) sb.append("&amp; ")
      }
      if (p % 2 == 0)
        sb.append(s"""<a href="/p/${(id + p) % 997}?a=1&amp;b=2">more</a>""")
      else
        sb.append(s"""<a href="https://ext${p % 7}.example.org/x">out</a>""")
      sb.append("</p>")
    }
    sb.append("</body></html>")
    val html = sb.toString
    val cs = if (id % 2 == 0) "windows-1251" else "UTF-8"
    (s"HTTPS://WWW.Host${id % 50}.co.uk:443/d${id % 9}/./page?utm_source=x&id=$id",
      html.getBytes(java.nio.charset.Charset.forName(cs)),
      if (id % 2 == 0) "text/html" else "text/html; charset=utf-8")
  }

  /** The fused read-path kernel over one shard blob; returns
    * (pages, links, cleanChars) to defeat dead-code elimination. */
  private def readShard(blob: Array[Byte]): (Long, Long, Long) = {
    var pages = 0L; var links = 0L; var chars = 0L
    WarcCodec.parseWarc(blob).foreach { doc =>
      val dec = CharsetSniff.decode(doc.body, doc.content_type)
      val e = HtmlExtract.extract(dec.text)
      val norm = UrlOps.normalize(doc.url)
      val resolved = e.links.flatMap(h =>
        UrlOps.resolve(doc.url, h).flatMap(UrlOps.normalize))
      pages += 1
      links += resolved.size
      chars += e.text.length + norm.map(_.length).getOrElse(0)
    }
    (pages, links, chars)
  }

  def main(args: Array[String]): Unit = {
    println("n_pages  warc_MB  wall_s  MB/s/core  pages/s/core  us/page  links/page")
    var sink = 0L
    Seq(500, 1500, 5000, 15000).foreach { n =>
      val shards = (0 until 16).map { s =>
        val bos = new java.io.ByteArrayOutputStream()
        WarcCodec.writeWarcGz(bos,
          Iterator.range(0, n).filter(_ % 16 == s).map { i => synthPage(i.toLong) })
        bos.toByteArray
      }
      val rawBytes = shards.map(_.length.toLong).sum
      // uncompressed page volume is what "MB/s" should mean for a scan
      val pageBytes = (0 until n).map(i => synthPage(i.toLong)._2.length.toLong).sum
      // warm-up pass (JIT), then 3 timed passes, best-of
      readShard(shards.head)
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val out = shards.map(readShard)
        sink += out.map(_._3).sum
        val links = out.map(_._2).sum
        (System.nanoTime() - t0, links)
      }
      val (bestNs, links) = times.minBy(_._1)
      val s = bestNs / 1e9
      println(f"$n%7d  ${pageBytes / 1e6}%7.1f  $s%6.3f  " +
        f"${pageBytes / 1e6 / s}%9.1f  ${n / s}%12.0f  ${s * 1e6 / n}%7.1f  " +
        f"${links.toDouble / n}%10.1f")
      val _ = rawBytes
    }
    System.err.println(s"[sink $sink]")
  }
}
