package graft.api

import graft.SparkFunSuite
import graft.operators.StoreConfig
import org.apache.spark.sql.functions._

/** The §2.1 validation matrix, end-to-end through SearchService. */
class SearchApiSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private val cfg = StoreConfig(idCol = "vec_id", titleCol = "source",
    vendorCol = "lang", descriptionCol = "text")

  private def service(
      embedder: Option[Embedder] = None,
      c: StoreConfig = cfg) =
    new SearchService(spark, emb, docs, ("vec_id", "doc_id"), c, embedder)

  private def vec: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)

  test("400: neither embedding nor query (app.py:328-332)") {
    val r = service().search(SearchRequest())
    assert(r.left.exists(_.status === 400))
  }

  test("400: both embedding and query (app.py:334-338)") {
    val r = service().search(SearchRequest(embedding = Some(vec), query = Some("x")))
    assert(r.left.exists(_.status === 400))
  }

  test("400: blank query string (app.py:344-345)") {
    val r = service().search(SearchRequest(query = Some("   ")))
    assert(r.left.exists(_.status === 400))
  }

  test("501: text query without a configured embedder (app.py:349-351)") {
    val r = service(embedder = None).search(SearchRequest(query = Some("hello")))
    assert(r.left.exists(_.status === 501))
  }

  test("502: embedder failure (app.py:352-354)") {
    val failing = new Embedder {
      def embed(q: String) = Left("connection refused")
    }
    val r = service(Some(failing)).search(SearchRequest(query = Some("hello")))
    assert(r.left.exists(e => e.status === 502 && e.message.contains("connection refused")))
  }

  test("400: non-positive k (app.py:368-370)") {
    val r = service().search(SearchRequest(embedding = Some(vec), k = Some(0)))
    assert(r.left.exists(e => e.status === 400 && e.message.contains("'k'")))
  }

  test("400: non-positive index_tree_search_top_size (app.py:373-375)") {
    val r = service().search(SearchRequest(embedding = Some(vec),
      indexTreeSearchTopSize = Some(-1)))
    assert(r.left.exists(_.status === 400))
  }

  test("500: filter with index enabled (app.py:171-172 via 388-390)") {
    val r = service(c = cfg.copy(indexEnabled = true))
      .search(SearchRequest(embedding = Some(vec), filter = Map("lang" -> "en")))
    assert(r.left.exists(_.status === 500))
  }

  test("success shape: results/count/search_time_ms; default k = 4 (app.py:363)") {
    val r = service().search(SearchRequest(embedding = Some(vec)))
    assert(r.isRight)
    val resp = r.toOption.get
    assert(resp.count === 4 && resp.results.length === 4)
    assert(resp.searchTimeMs > 0)
    assert(resp.results.head.id === "0") // self match
    assert(resp.results.head.score.exists(s => math.abs(s - 1.0) < 1e-9))
  }

  test("text-query path end-to-end with the deterministic embedder") {
    val r = service(Some(new DeterministicEmbedder(64)))
      .search(SearchRequest(query = Some("fast table scan"), k = Some(3)))
    assert(r.isRight)
    assert(r.toOption.get.count === 3)
  }

  test("deterministic embedder: stable, normalized, dimensioned") {
    val e = new DeterministicEmbedder(64)
    val a = e.embed("the quick fox").toOption.get
    val b = e.embed("the quick fox").toOption.get
    assert(a.toSeq === b.toSeq)
    assert(a.length === 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("health: real constant query (app.py:89-102)") {
    assert(service().health())
  }

  test("config echo contains the effective settings (app.py:393-405)") {
    val json = service().configJson()
    assert(json.contains("\"search_strategy\": \"CosineSimilarity\""))
    assert(json.contains("\"index_enabled\": false"))
    assert(json.contains("\"default_k\": 4"))
  }

  test("HttpEmbedder speaks the reference wire contract (local stub server)") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenBody: String = ""
    server.createContext("/embed", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val resp = """{"Embedding": [0.5, -0.25, 0.125]}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/embed"
      val got = new HttpEmbedder(url).embed("hello world")
      assert(got.isRight)
      assert(got.toOption.get.toSeq === Seq(0.5f, -0.25f, 0.125f))
      // request carries the reference's TextSegments payload (app.py:129)
      assert(seenBody.contains("\"TextSegments\""))
      assert(seenBody.contains("\"query\": \"hello world\""))
    } finally server.stop(0)
  }

  test("HttpEmbedder: non-2xx -> Left (maps to 502)") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/embed"
      assert(new HttpEmbedder(url).embed("x").isLeft)
    } finally server.stop(0)
  }
}
