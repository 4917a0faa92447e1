package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * The decoder is validated against the JDK's OWN JPEG codec
 * (javax.imageio — an independent implementation of the same public
 * standard, shipped with every Java SE): encode a raster with ImageIO,
 * decode the bytes with [[JpegDecoder]], and compare luminance planes.
 * Two conforming decoders may differ by ±1–2 per pixel on non-flat
 * blocks (T.81 only bounds IDCT accuracy, it does not prescribe one
 * implementation), so gradients compare within a small tolerance;
 * block-UNIFORM images are DC-only (every AC coefficient is exactly
 * zero), where any conforming IDCT is flat and the comparison is
 * EXACT — that is the fixture family the driver oracle pins.
 */
class JpegDecoderSpec extends AnyFunSuite {

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
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

  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    img
  }

  private def imageIoLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    gray.getGraphics.drawImage(img, 0, 0, null)
    (w, h, Array.tabulate(w * h)(i => gray.getRaster.getSample(i % w, i / w, 0)))
  }

  private def maxAbsDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("block-uniform grayscale decodes EXACTLY (DC-only blocks)") {
    // 16x16, four uniform 8x8 blocks — every AC coefficient is zero.
    val levels = Array(32, 96, 160, 224)
    val img = grayImage(16, 16)((x, y) => levels((y / 8) * 2 + (x / 8)))
    val bytes = encodeJpeg(img, 0.75f)
    val got = JpegDecoder.decodeJpegBaseline(bytes).get
    val (w, h, expect) = imageIoLuma(bytes)
    assert((got.width, got.height) === ((w, h)))
    assert(got.gray === expect) // bit-exact: conforming IDCTs agree on flat blocks
  }

  test("grayscale gradient within IDCT tolerance of the JDK decoder") {
    val img = grayImage(40, 24)((x, y) => (x * 5 + y * 3) % 256)
    for (q <- Seq(0.5f, 0.9f)) {
      val bytes = encodeJpeg(img, q)
      val got = JpegDecoder.decodeJpegBaseline(bytes).get
      val (w, h, expect) = imageIoLuma(bytes)
      assert((got.width, got.height) === ((w, h)))
      assert(maxAbsDiff(got.gray, expect) <= 2, s"quality $q")
    }
  }

  test("non-multiple-of-8 dimensions decode at exact size") {
    val img = grayImage(13, 9)((x, y) => x * 17 + y * 11)
    val got = JpegDecoder.decodeJpegBaseline(encodeJpeg(img, 0.8f)).get
    assert((got.width, got.height) === ((13, 9)))
  }

  test("color (YCbCr, subsampled) decodes the luma plane within tolerance") {
    val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 15) << 8) | ((x * y) & 0xff))
    val bytes = encodeJpeg(img, 0.85f)
    val got = JpegDecoder.decodeJpegBaseline(bytes).get
    val (w, h, expect) = imageIoLuma(bytes)
    assert((got.width, got.height) === ((w, h)))
    // our luma is JFIF Y straight from the bitstream; ImageIO's gray
    // conversion goes Y→RGB→gray, which costs a couple of counts more
    assert(maxAbsDiff(got.gray, expect) <= 4)
  }

  test("embedded driver fixtures: pinned stats are real, gray ones ImageIO-exact") {
    JpegFixtures.payloads.zip(JpegFixtures.expected).foreach {
      case ((fid, bytes), (eid, w, h, n, fullBins)) =>
        assert(fid === eid.toLong)
        val img = JpegDecoder.decodeJpegBaseline(bytes).get
        assert((img.width, img.height, img.gray.length) === ((w, h, n)))
        val hist = Multimodal.luminanceHistogram(img, 16)
        hist.zipWithIndex.foreach { case (c, b) =>
          assert(c === (if (fullBins(b)) 64L else 0L), s"fixture $fid bin $b")
        }
        // gray fixtures (single-component) must equal the independent
        // JDK decode bit-for-bit — DC-only blocks leave no IDCT slack
        if (fid < 2) {
          val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val expect = Array.tabulate(w * h)(i =>
            jdk.getRaster.getSample(i % w, i / w, 0))
          assert(img.gray === expect, s"fixture $fid")
        }
    }
  }

  test("malformed inputs return None, never throw") {
    val valid = encodeJpeg(grayImage(16, 16)((x, y) => x * y), 0.8f)
    assert(JpegDecoder.decodeJpegBaseline(null).isEmpty)
    assert(JpegDecoder.decodeJpegBaseline(Array[Byte]()).isEmpty)
    assert(JpegDecoder.decodeJpegBaseline("not a jpeg".getBytes).isEmpty)
    assert(JpegDecoder.decodeJpegBaseline(valid.take(20)).isEmpty) // truncated header
    assert(JpegDecoder.decodeJpegBaseline(valid.dropRight(40)).isEmpty) // truncated scan
    val corrupted = valid.clone()
    corrupted(2) = 0x00 // break the first marker
    assert(JpegDecoder.decodeJpegBaseline(corrupted).isEmpty)
  }

  private def encodeProgressive(img: BufferedImage, quality: Float = -1f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    if (quality >= 0) {
      params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
    }
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), params)
    out.close()
    writer.dispose()
    bos.toByteArray
  }

  private def isProgressive(bytes: Array[Byte]): Boolean =
    bytes.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2)

  test("the strict-baseline entry still refuses progressive payloads") {
    val bytes = encodeProgressive(grayImage(16, 16)((x, y) => x + y))
    assert(isProgressive(bytes)) // sanity: SOF2 present
    assert(JpegDecoder.decodeJpegBaseline(bytes).isEmpty)
    // ...and the progressive entry refuses baseline payloads
    val base = encodeJpeg(grayImage(16, 16)((x, y) => x + y), 0.8f)
    assert(JpegDecoder.decodeJpegProgressive(base).isEmpty)
  }

  test("progressive block-uniform grayscale decodes EXACTLY (DC-only blocks)") {
    // Same block-uniform family as the baseline fixtures: every AC
    // coefficient is zero, so the multi-scan successive-approximation
    // reconstruction must land on the identical flat raster.
    val levels = Array(32, 96, 160, 224)
    val img = grayImage(16, 16)((x, y) => levels((y / 8) * 2 + (x / 8)))
    for (q <- Seq(0.75f, 0.9f)) {
      val bytes = encodeProgressive(img, q)
      assert(isProgressive(bytes))
      val got = JpegDecoder.decodeJpegProgressive(bytes).get
      val (w, h, expect) = imageIoLuma(bytes)
      assert((got.width, got.height) === ((w, h)))
      assert(got.gray === expect, s"quality $q")
    }
  }

  test("progressive grayscale gradient within IDCT tolerance of the JDK decoder") {
    // Gradients make the JDK's default progressive scan script do real
    // work in every scan class: DC first with successive approximation,
    // DC refinement, AC first with EOB runs, AC refinement bits.
    val img = grayImage(40, 24)((x, y) => (x * 5 + y * 3) % 256)
    for (q <- Seq(-1f, 0.5f, 0.9f)) { // -1 = writer default quality
      val bytes = encodeProgressive(img, q)
      assert(isProgressive(bytes))
      val got = JpegDecoder.decodeJpegProgressive(bytes).get
      val (w, h, expect) = imageIoLuma(bytes)
      assert((got.width, got.height) === ((w, h)))
      assert(maxAbsDiff(got.gray, expect) <= 2, s"quality $q")
    }
  }

  test("progressive noise image matches the JDK decoder (deep EOB-run coverage)") {
    val rnd = new scala.util.Random(42)
    val img = grayImage(48, 32)((_, _) => rnd.nextInt(256))
    val bytes = encodeProgressive(img, 0.6f)
    assert(isProgressive(bytes))
    val got = JpegDecoder.decodeJpegProgressive(bytes).get
    val (w, h, expect) = imageIoLuma(bytes)
    assert((got.width, got.height) === ((w, h)))
    assert(maxAbsDiff(got.gray, expect) <= 2)
  }

  test("progressive color (YCbCr, subsampled) decodes the luma plane within tolerance") {
    val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 15) << 8) | ((x * y) & 0xff))
    val bytes = encodeProgressive(img, 0.85f)
    assert(isProgressive(bytes))
    val got = JpegDecoder.decodeJpegProgressive(bytes).get
    val (w, h, expect) = imageIoLuma(bytes)
    assert((got.width, got.height) === ((w, h)))
    assert(maxAbsDiff(got.gray, expect) <= 4) // Y→RGB→gray slack, as baseline
  }

  test("progressive non-multiple-of-8 dimensions decode at exact size") {
    val img = grayImage(13, 9)((x, y) => x * 17 + y * 11)
    val got = JpegDecoder.decodeJpegProgressive(encodeProgressive(img, 0.8f)).get
    assert((got.width, got.height) === ((13, 9)))
  }

  test("progressive malformed inputs return None, never throw") {
    val valid = encodeProgressive(grayImage(16, 16)((x, y) => x * y), 0.8f)
    assert(JpegDecoder.decodeJpegProgressive(null).isEmpty)
    assert(JpegDecoder.decodeJpegProgressive(Array[Byte]()).isEmpty)
    assert(JpegDecoder.decodeJpegProgressive("not a jpeg".getBytes).isEmpty)
    assert(JpegDecoder.decodeJpegProgressive(valid.take(20)).isEmpty)
    for (cut <- Seq(10, 40, 100, 200))
      assert(JpegDecoder.decodeJpegProgressive(valid.dropRight(cut)).isEmpty,
        s"cut $cut") // truncated mid-scan: missing EOI / missing data
    val corrupted = valid.clone()
    corrupted(2) = 0x00
    assert(JpegDecoder.decodeJpegProgressive(corrupted).isEmpty)
  }

  test("decoder is total under deterministic byte fuzzing (crawl-grade malformed media)") {
    // At 100 TB the decoder sees arbitrarily corrupted bytes claiming
    // to be JPEG; every mutation must return (Some or None), never
    // throw, never hang. Deterministic seed → reproducible failures.
    val validProg = encodeProgressive(grayImage(24, 24)((x, y) => (x * y) % 256), 0.7f)
    val validBase = encodeJpeg(grayImage(24, 24)((x, y) => (x * y) % 256), 0.7f)
    val rnd = new scala.util.Random(1234)
    for (valid <- Seq(validProg, validBase); _ <- 0 until 200) {
      val mutated = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      JpegDecoder.decodeJpeg(mutated) // any result — just no throw/hang
    }
    for (valid <- Seq(validProg, validBase); len <- 1 until valid.length by 7)
      JpegDecoder.decodeJpeg(valid.take(len))
  }

  test("decodeJpeg sniffs both flavors") {
    val img = grayImage(16, 8)((x, y) => 7 * x + y)
    val base = encodeJpeg(img, 0.9f)
    val prog = encodeProgressive(img, 0.9f)
    assert(JpegDecoder.decodeJpeg(base).exists(i => i.width == 16 && i.height == 8))
    assert(JpegDecoder.decodeJpeg(prog).exists(i => i.width == 16 && i.height == 8))
    assert(Multimodal.decodeImage(prog).exists(i => i.width == 16 && i.height == 8))
  }

  test("netpbm-or-jpeg combined decode picks the right decoder") {
    val jpeg = encodeJpeg(grayImage(16, 8)((x, y) => 7 * x + y), 0.9f)
    val pgm = ("P5\n4 2\n255\n" + "ABCDEFGH").getBytes("US-ASCII")
    assert(Multimodal.decodeImage(jpeg).exists(i => i.width == 16 && i.height == 8))
    assert(Multimodal.decodeImage(pgm).exists(i => i.width == 4 && i.height == 2))
    assert(Multimodal.decodeImage("garbage".getBytes).isEmpty)
  }
}
