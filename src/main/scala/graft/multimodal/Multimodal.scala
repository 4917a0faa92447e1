package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines — treat
 * image/audio/video payloads as opaque `binary` columns with typed
 * metadata, and run decode / feature-extraction as distributed
 * per-partition batch transforms.
 *
 * The Spark-side plumbing here (schema, partition-parallel execution,
 * batch shape, deterministic output) is real and tested; the actual
 * media decode is a clearly marked STUB — the container has no
 * image/audio libraries, and in production [[decodeStub]] is the single
 * function to replace with a JNI/javacpp decoder. Nothing else changes:
 * the operator remains a `mapPartitions` over binary payloads, which is
 * exactly the shape a 1000-executor cluster wants (no driver
 * involvement, no shuffle, vectorized Parquet binary reads upstream).
 */
object Multimodal {

  /** One extracted-feature row. */
  final case class FeatureRow(id: Long, n_bytes: Long, features: Array[Float])

  /** One sampled frame (video/audio chunking). */
  final case class FrameRow(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /**
   * STUB decode: byte-histogram "features" standing in for a real
   * image/audio decoder. Deterministic, pure, per-row — the production
   * replacement (e.g. JPEG decode + CNN embedding) has the identical
   * signature and distribution contract.
   */
  def decodeStub(payload: Array[Byte], bins: Int): Array[Float] = {
    val hist = new Array[Float](bins)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    val n = payload.length.toFloat
    var b = 0
    while (b < bins) { hist(b) /= n; b += 1 }
    hist
  }

  /**
   * Feature extraction over a binary payload column: distributed
   * `mapPartitions`, one batch of rows per partition, no shuffle.
   */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      bins: Int = 16): Dataset[FeatureRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          FeatureRow(id,
            if (payload == null) 0L else payload.length.toLong,
            decodeStub(payload, bins))
        }
      }
  }

  /**
   * Frame sampling (video → frames, audio → windows): STUB splits the
   * payload into `nFrames` contiguous chunks; a real implementation
   * would seek keyframes. One input row → up to `nFrames` output rows,
   * still shuffle-free (flatMap within partitions).
   */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      nFrames: Int): Dataset[FrameRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null || payload.isEmpty) Iterator.empty
        else {
          val chunk = math.max(1, payload.length / nFrames)
          (0 until math.min(nFrames, payload.length)).iterator.map { i =>
            val from = i * chunk
            val until = if (i == nFrames - 1) payload.length
                        else math.min(payload.length, from + chunk)
            FrameRow(id, i, java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
  }
}
