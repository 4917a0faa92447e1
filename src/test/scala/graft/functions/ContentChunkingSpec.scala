package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** CDC (content-defined chunking) properties — the shift tolerance that
  * distinguishes it from fixed-size blocking. */
class ContentChunkingSpec extends SparkFunSuite {

  private def chunks(payload: Array[Byte], avgBits: Int = 5): Seq[Long] =
    TextHashKernels.gearChunkHashes(payload, avgBits).toLongArray().toSeq

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  test("deterministic: identical payloads chunk identically") {
    val p = randomBytes(4096, 1)
    assert(chunks(p) === chunks(p.clone()))
  }

  test("shift tolerance: a prefix edit preserves most chunk fingerprints") {
    val p = randomBytes(8192, 2)
    val edited = Array.fill[Byte](17)(42) ++ p // insert 17 bytes at front
    val a = chunks(p).toSet
    val b = chunks(edited).toSet
    val shared = (a intersect b).size.toDouble / a.size
    // structural since the rolling hash never resets: boundaries are
    // content-determined, so only the chunks inside the edit window die
    assert(shared > 0.9, s"only ${(shared * 100).round}% of chunks survived a prefix insert")
  }

  test("chunk sizes respect the min/max bounds") {
    val p = randomBytes(100000, 3)
    val n = chunks(p, avgBits = 6).size
    // avg 64 B, min 16, max 256 → count within [len/256, len/16]
    assert(n >= 100000 / 256 && n <= 100000 / 16, s"got $n chunks")
  }

  test("edge cases: empty payload, payload shorter than min chunk") {
    assert(chunks(Array.empty) === Seq.empty)
    val tiny = randomBytes(3, 4)
    val c = chunks(tiny)
    assert(c.length === 1)
    assert(c.head === TextHashKernels.fnv1a64(tiny, 0, 3))
  }

  test("expression through the plan: identical texts share all chunks") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq((1L, "abcdefgh" * 20), (2L, "abcdefgh" * 20), (3L, "zyxwvuts" * 20))
      .toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("payload"))
    val rows = d.select(col("id"),
      GraftFunctions.contentChunkHashes(col("payload"), 4).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
  }

  test("chunkDedupStats finds shared chunks across duplicate payloads") {
    import spark.implicits._
    val d = Seq((1L, "abcdefgh" * 40), (2L, "abcdefgh" * 40), (3L, "qrstuvwx" * 40))
      .toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("payload"))
    val stats = graft.operators.Dedup.chunkDedupStats(d, "id", "payload", avgBits = 4)
      .collect()
    assert(stats.nonEmpty)
    // duplicated chunks span docs 1 and 2
    assert(stats.exists(r => r.getLong(2) >= 2L && r.getLong(3) === 1L))
  }
}
