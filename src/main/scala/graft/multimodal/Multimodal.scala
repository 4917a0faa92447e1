package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines — treat
 * image/audio/video payloads as opaque `binary` columns with typed
 * metadata, and run decode / feature-extraction as distributed
 * per-partition batch transforms.
 *
 * Decode status, honestly split by format family:
 *  - '''Netpbm (PGM `P5` / PPM `P6`) — REAL decoder''', pure Scala
 *    ([[decodeNetpbm]]): header parse (magic, dimensions, maxval,
 *    comments), pixel extraction, luminance conversion, nearest-
 *    neighbor downsampling. No native libraries needed, so this path
 *    runs end-to-end in this container and is driver-oracle-verified.
 *  - '''Compressed formats (JPEG/PNG/audio/video) — STUB'''
 *    ([[decodeStub]]): the container has no codec libraries; in
 *    production it is the single function to replace with a
 *    JNI/javacpp decoder. Nothing else changes.
 *
 * Either way the operator shape is the same: `mapPartitions` over
 * binary payloads — no driver involvement, no shuffle, vectorized
 * Parquet binary reads upstream; exactly what a 1000-executor cluster
 * wants.
 */
object Multimodal {

  /** A decoded raster image: `gray` holds row-major 0–255 luminance. */
  final case class RasterImage(width: Int, height: Int, gray: Array[Int])

  /**
   * Pure-Scala Netpbm decoder for binary PGM (`P5`, grayscale) and PPM
   * (`P6`, RGB) with maxval ≤ 255 — the public format per the Netpbm
   * spec: ASCII header `magic width height maxval` with `#` comments
   * and arbitrary whitespace, then one (P5) or three (P6) bytes per
   * pixel. RGB collapses to luminance with the integer BT.601 weights
   * (299·R + 587·G + 114·B) / 1000. Returns None on any malformed
   * header or truncated pixel data — never throws.
   */
  def decodeNetpbm(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 2) return None
    val magic = new String(payload, 0, 2, java.nio.charset.StandardCharsets.US_ASCII)
    val channels = magic match {
      case "P5" => 1
      case "P6" => 3
      case _    => return None
    }
    // header tokenizer: whitespace-separated ints, '#' comments to EOL
    var pos = 2
    def nextInt(): Option[Int] = {
      while (pos < payload.length &&
        (payload(pos) == ' ' || payload(pos) == '\n' || payload(pos) == '\r' ||
          payload(pos) == '\t' || payload(pos) == '#')) {
        if (payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else pos += 1
      }
      val start = pos
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') pos += 1
      if (pos == start) None
      else Some(new String(payload, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII).toInt)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates the header from pixels
      if pos < payload.length
      _ = { pos += 1 }
      if payload.length - pos >= w * h * channels
    } yield {
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        val off = pos + i * channels
        gray(i) =
          if (channels == 1) payload(off) & 0xff
          else ((payload(off) & 0xff) * 299 + (payload(off + 1) & 0xff) * 587 +
            (payload(off + 2) & 0xff) * 114) / 1000
        i += 1
      }
      RasterImage(w, h, gray)
    }
  }

  /** Nearest-neighbor downsample to (outW × outH) — the resize step of
    * an image-preprocessing pipeline, integer arithmetic only. */
  def downsample(img: RasterImage, outW: Int, outH: Int): RasterImage = {
    require(outW > 0 && outH > 0, s"bad target $outW x $outH")
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = img.gray(sy * img.width + x * img.width / outW)
        x += 1
      }
      y += 1
    }
    RasterImage(outW, outH, out)
  }

  /** Luminance histogram of a decoded image (counts, not ratios —
    * exact integers survive any accumulation order). */
  def luminanceHistogram(img: RasterImage, bins: Int): Array[Long] = {
    val hist = new Array[Long](bins)
    var i = 0
    while (i < img.gray.length) {
      hist(img.gray(i) * bins / 256) += 1L
      i += 1
    }
    hist
  }

  /** One decoded-image feature row: real dimensions + histogram. */
  final case class ImageFeatureRow(
      id: Long, width: Int, height: Int, n_pixels: Long, hist: Array[Long])

  /**
   * REAL image feature extraction over Netpbm payloads: decode →
   * luminance histogram, `mapPartitions`, no shuffle. Rows whose
   * payload is not valid Netpbm are dropped (a production pipeline
   * would route them to a quarantine sink).
   */
  def extractImageFeatures(
      df: DataFrame, idCol: String, payloadCol: String,
      bins: Int = 16): Dataset[ImageFeatureRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          decodeNetpbm(payload).map { img =>
            ImageFeatureRow(id, img.width, img.height,
              img.gray.length.toLong, luminanceHistogram(img, bins))
          }
        }
      }
  }

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
