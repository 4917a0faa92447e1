package graft.multimodal

import graft.SparkFunSuite
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  test("decodeStub: deterministic, normalized histogram") {
    val payload = Array.tabulate(256)(_.toByte)
    val h1 = Multimodal.decodeStub(payload, 16)
    val h2 = Multimodal.decodeStub(payload, 16)
    assert(h1.toSeq === h2.toSeq)
    assert(math.abs(h1.sum - 1.0f) < 1e-5)
    // uniform bytes → uniform histogram
    assert(h1.forall(v => math.abs(v - 1.0f / 16) < 1e-6))
    assert(Multimodal.decodeStub(Array.empty, 16).forall(_ === 0f))
  }

  test("extractFeatures: distributed over binary payloads, schema + counts") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val payloads = emb.select(col("vec_id"),
      GraftFunctions.toBinaryVector(col("embedding")).as("payload"))
    val feats = Multimodal.extractFeatures(payloads, "vec_id", "payload", bins = 16)
    val rows = feats.collect()
    assert(rows.length === emb.count())
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(_.n_bytes === 64 * 4 + 1)) // 64-dim f32 + tag
  }

  test("sampleFrames: chunks reassemble to the original payload") {
    import spark.implicits._
    val payload = Array.tabulate(100)(_.toByte)
    val df = Seq((7L, payload)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", nFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 4)
    val reassembled = frames.flatMap(_.frame_bytes)
    assert(reassembled.toSeq === payload.toSeq)
  }
}
