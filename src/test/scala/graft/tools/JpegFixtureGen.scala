package graft.tools

import graft.multimodal.{JpegDecoder, Multimodal}

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * One-time generator for the `multimodal_jpeg_decode` driver fixtures
 * (graft.multimodal.JpegFixtures): encodes three block-uniform images
 * with the JDK's ImageIO JPEG encoder, prints each payload as base64
 * plus the luminance stats OUR decoder produces. Block-uniform images
 * are DC-only, where every conforming IDCT is exact — JpegDecoderSpec
 * asserts our decode is bit-identical to ImageIO's for this family, so
 * the pinned stats are decoder-independent ground truth, not
 * self-confirmation. Run: sbt "Test/runMain graft.tools.JpegFixtureGen"
 */
object JpegFixtureGen {

  private def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), params)
    out.close()
    writer.dispose()
    bos.toByteArray
  }

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, f(x, y))
    img
  }

  private def encodeProgressive(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), params)
    out.close()
    writer.dispose()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val fixtures: Seq[(String, Array[Byte])] = Seq(
      "gray 16x16, blocks 32/96/160/224, q0.75" ->
        encode(gray(16, 16)((x, y) => Array(32, 96, 160, 224)((y / 8) * 2 + (x / 8))), 0.75f),
      "gray 24x8, blocks 0/128/255, q0.9" ->
        encode(gray(24, 8)((x, _) => Array(0, 128, 255)(x / 8)), 0.9f),
      "color 32x16 rgb uniform 8x8 blocks, q0.85" -> {
        val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
        val colors = Array(0xcc2244, 0x22cc44, 0x2244cc, 0xcccc22, 0x22cccc, 0xcc22cc, 0x777777, 0xffffff)
        for (y <- 0 until 16; x <- 0 until 32)
          img.setRGB(x, y, colors((y / 8) * 4 + (x / 8)))
        encode(img, 0.85f)
      })
    fixtures.zipWithIndex.foreach { case ((desc, bytes), i) =>
      val img = JpegDecoder.decodeJpegBaseline(bytes).get
      val hist = Multimodal.luminanceHistogram(img, 16)
      println(s"// fixture $i: $desc (${bytes.length} bytes)")
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
      println(b64.grouped(72).map(s => "\"" + s + "\"").mkString(" +\n"))
      println(s"// decoded ${img.width}x${img.height}; hist=${hist.mkString(",")}")
      println(s"// rows: ${hist.zipWithIndex.map { case (c, b) =>
        s"($i, ${img.width}, ${img.height}, ${img.gray.length}, $b, $c)" }.mkString(", ")}")
      println()
    }

    // --- progressive (SOF2) fixtures: the SAME block-uniform rasters,
    //     written with ImageIO's progressive scan script. DC-only
    //     blocks reconstruct exactly through successive approximation,
    //     so the pinned stats stay decoder-independent ground truth;
    //     the generator ASSERTS exact agreement with ImageIO's own
    //     decode before printing anything to freeze.
    val progressive: Seq[(String, Array[Byte])] = Seq(
      "PROGRESSIVE gray 16x16, blocks 32/96/160/224, q0.75" ->
        encodeProgressive(gray(16, 16)((x, y) => Array(32, 96, 160, 224)((y / 8) * 2 + (x / 8))), 0.75f),
      "PROGRESSIVE gray 24x8, blocks 0/128/255, q0.9" ->
        encodeProgressive(gray(24, 8)((x, _) => Array(0, 128, 255)(x / 8)), 0.9f),
      "PROGRESSIVE color 32x16 rgb uniform 8x8 blocks, q0.85" -> {
        val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
        val colors = Array(0xcc2244, 0x22cc44, 0x2244cc, 0xcccc22, 0x22cccc, 0xcc22cc, 0x777777, 0xffffff)
        for (y <- 0 until 16; x <- 0 until 32)
          img.setRGB(x, y, colors((y / 8) * 4 + (x / 8)))
        encodeProgressive(img, 0.85f)
      })
    progressive.zipWithIndex.foreach { case ((desc, bytes), i) =>
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2), "not progressive")
      val img = JpegDecoder.decodeJpegProgressive(bytes).get
      val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val gray8 = new BufferedImage(jdk.getWidth, jdk.getHeight, BufferedImage.TYPE_BYTE_GRAY)
      gray8.getGraphics.drawImage(jdk, 0, 0, null)
      val expect = Array.tabulate(img.width * img.height)(p =>
        gray8.getRaster.getSample(p % img.width, p / img.width, 0))
      val maxDiff = img.gray.zip(expect).map { case (a, b) => math.abs(a - b) }.max
      println(s"// progressive fixture $i: $desc (${bytes.length} bytes, maxDiffVsJdk=$maxDiff)")
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
      println(b64.grouped(72).map(s => "\"" + s + "\"").mkString(" +\n"))
      val hist = Multimodal.luminanceHistogram(img, 16)
      println(s"// decoded ${img.width}x${img.height}; hist=${hist.mkString(",")}")
      println(s"// fullBins: ${hist.zipWithIndex.collect { case (c, b) if c == 64 => b }.mkString(",")}")
      println()
    }
  }
}
