package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Env-var config resolution parity with the reference
  * (/root/reference/app.py:40-66, env.example:9-27): every variable's
  * default and override behavior. */
class StoreConfigSpec extends AnyFunSuite {

  test("empty environment yields the reference defaults for every field") {
    assert(StoreConfig.fromEnv(Map.empty) === StoreConfig(
      idCol = "id", titleCol = "title", vendorCol = "vendor",
      descriptionCol = "description", embeddingCol = "embedding",
      strategy = SearchStrategy.CosineSimilarity,
      indexEnabled = false, searchTopSize = 10, defaultK = 4,
      tableName = "ydb_langchain_store", indexName = "ydb_vector_index",
      passAsBytes = true, embeddingApiUrl = None))
  }

  test("every env.example variable overrides its field") {
    val cfg = StoreConfig.fromEnv(Map(
      "COLUMN_ID" -> "pk",
      "COLUMN_TITLE" -> "name",
      "COLUMN_VENDOR" -> "brand",
      "COLUMN_DESCRIPTION" -> "body",
      "COLUMN_EMBEDDING" -> "vec",
      "SEARCH_STRATEGY" -> "ManhattanDistance",
      "INDEX_ENABLED" -> "TRUE", // case-insensitive, app.py:58
      "INDEX_TREE_SEARCH_TOP_SIZE" -> "7",
      "YDB_TABLE" -> "my_store",
      "INDEX_NAME" -> "my_index",
      "VECTOR_PASS_AS_BYTES" -> "false",
      "EMBEDDING_API_URL" -> "http://localhost:9999/embed"))
    assert(cfg.idCol === "pk")
    assert(cfg.titleCol === "name")
    assert(cfg.vendorCol === "brand")
    assert(cfg.descriptionCol === "body")
    assert(cfg.embeddingCol === "vec")
    assert(cfg.strategy === SearchStrategy.ManhattanDistance)
    assert(cfg.indexEnabled)
    assert(cfg.searchTopSize === 7)
    assert(cfg.tableName === "my_store")
    assert(cfg.indexName === "my_index")
    assert(!cfg.passAsBytes)
    assert(cfg.embeddingApiUrl === Some("http://localhost:9999/embed"))
  }

  test("boolean parsing mirrors the reference: only 'true' (any case) is true") {
    assert(!StoreConfig.fromEnv(Map("INDEX_ENABLED" -> "1")).indexEnabled)
    assert(!StoreConfig.fromEnv(Map("INDEX_ENABLED" -> "yes")).indexEnabled)
    assert(StoreConfig.fromEnv(Map("INDEX_ENABLED" -> "True")).indexEnabled)
    // VECTOR_PASS_AS_BYTES defaults true; any non-"true" value disables
    assert(!StoreConfig.fromEnv(Map("VECTOR_PASS_AS_BYTES" -> "0")).passAsBytes)
  }

  test("empty EMBEDDING_API_URL means not-configured (app.py:66)") {
    assert(StoreConfig.fromEnv(Map("EMBEDDING_API_URL" -> "")).embeddingApiUrl === None)
  }

  test("invalid SEARCH_STRATEGY and non-integer top size fail loudly") {
    intercept[IllegalArgumentException] {
      StoreConfig.fromEnv(Map("SEARCH_STRATEGY" -> "L2"))
    }
    intercept[NumberFormatException] {
      StoreConfig.fromEnv(Map("INDEX_TREE_SEARCH_TOP_SIZE" -> "many"))
    }
  }
}
