package graft.sources

import graft.SparkFunSuite

import java.nio.charset.StandardCharsets.UTF_8

class WarcCodecSpec extends SparkFunSuite {

  private val docs = Seq(
    ("https://a.example/1", "hello warc world".getBytes(UTF_8)),
    // binary body with CRLFs, NULs, and 0xFF bytes: Content-Length
    // framing must carry it exactly — no scanning for separators
    ("https://a.example/2", Array.tabulate(300)(i => (i % 256).toByte)),
    ("https://a.example/3", "".getBytes(UTF_8))) // empty body

  test("gzip round trip: every response record back byte-identical, warcinfo skipped") {
    val blob = WarcCodec.buildWarcGz(docs)
    val got = WarcCodec.parseWarc(blob)
    assert(got.map(_.url) === docs.map(_._1))
    assert(got.forall(_.http_status === 200))
    got.zip(docs).foreach { case (doc, (_, body)) =>
      assert(doc.body.toSeq === body.toSeq, doc.url)
    }
  }

  test("plain (uncompressed) WARC parses identically") {
    val plain = WarcCodec.warcinfoRecord("x") ++
      docs.flatMap { case (u, b) => WarcCodec.responseRecord(u, b) }
    val got = WarcCodec.parseWarc(plain)
    assert(got.map(_.url) === docs.map(_._1))
  }

  test("HTTP Content-Type travels the record and comes back verbatim") {
    val ct = "text/html; charset=windows-1251"
    val rec = WarcCodec.responseRecord("https://a.example/ct", "x".getBytes(UTF_8), ct)
    val got = WarcCodec.parseWarc(rec)
    assert(got.size === 1 && got.head.content_type === ct)
    // default writer declares its own charset; absent header → ""
    assert(WarcCodec.parseWarc(
      WarcCodec.responseRecord("https://a.example/d", "y".getBytes(UTF_8)))
      .head.content_type === "text/plain; charset=utf-8")
  }

  test("writeWarcGz streams records without materializing the shard") {
    // the writer must pull from the iterator lazily — record N is
    // compressed and written to the stream before record N+1 is even
    // produced, so the output size observed at each production grows
    // strictly (no buffering of the record set)
    val bos = new java.io.ByteArrayOutputStream()
    val sizeAtProduction = scala.collection.mutable.ArrayBuffer.empty[Int]
    val it = (0 until 50).iterator.map { i =>
      sizeAtProduction += bos.size()
      (s"https://a.example/$i", s"body $i".getBytes(UTF_8), "text/plain")
    }
    WarcCodec.writeWarcGz(bos, it)
    assert(sizeAtProduction.size === 50)
    assert(sizeAtProduction.sliding(2).forall { w => w(0) < w(1) },
      sizeAtProduction.take(5).toString)
    val got = WarcCodec.parseWarc(bos.toByteArray)
    assert(got.map(_.url) === (0 until 50).map(i => s"https://a.example/$i"))
    assert(got.map(d => new String(d.body, UTF_8)) ===
      (0 until 50).map(i => s"body $i"))
  }

  test("truncation is total: records before the damage survive, tail drops") {
    val blob = WarcCodec.buildWarcGz(docs)
    for (cut <- Seq(1, 10, blob.length / 3, blob.length / 2, blob.length - 5)) {
      val got = WarcCodec.parseWarc(blob.take(cut)) // must not throw
      assert(got.size <= docs.size)
      got.zipWithIndex.foreach { case (doc, i) =>
        assert(doc.url === docs(i)._1) // surviving prefix is intact
      }
    }
    assert(WarcCodec.parseWarc(null) === Seq.empty)
    assert(WarcCodec.parseWarc(Array[Byte]()) === Seq.empty)
    assert(WarcCodec.parseWarc("random junk, not warc".getBytes(UTF_8)) === Seq.empty)
  }

  test("parser is total under deterministic byte fuzzing") {
    val blob = WarcCodec.buildWarcGz(docs)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val mutated = blob.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      WarcCodec.parseWarc(mutated) // any result — just no throw/hang
    }
  }

  test("exportWarcShards → parse is the identity on a real corpus slice") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val expected = corpus.as[(Long, String)].collect().toMap
    val shards = WarcCodec.exportWarcShards(corpus, "doc_id", "text", nShards = 4)
    assert(shards.count() === 4L)
    val back = shards.as[(Int, Array[Byte])].collect().flatMap { case (_, blob) =>
      WarcCodec.parseWarc(blob)
    }
    assert(back.length === expected.size)
    back.foreach { doc =>
      val id = doc.url.split("/").last.toLong
      assert(new String(doc.body, UTF_8) === expected(id), s"doc $id")
    }
  }

  test("readWarcFiles: binaryFile scan over a shard directory, no shuffle before parse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toFile
    Seq(docs.take(2), docs.drop(2)).zipWithIndex.foreach { case (part, i) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"shard-$i.warc.gz").toPath,
        WarcCodec.buildWarcGz(part))
    }
    val ds = WarcCodec.readWarcFiles(spark, dir.getAbsolutePath)
    val got = ds.collect().map(d => d.url -> new String(d.body, UTF_8)).toMap
    assert(got.keySet === docs.map(_._1).toSet)
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // scan-stage parse, shuffle-free
  }
}
