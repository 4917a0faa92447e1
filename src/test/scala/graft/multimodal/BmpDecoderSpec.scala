package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO}

/** Validated against the JDK's OWN BMP codec: the format is
  * uncompressed, so every comparison is bit-exact. */
class BmpDecoderSpec extends AnyFunSuite {

  private def encodeBmp(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("bmp").next()
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(new IIOImage(img, null, null))
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

  test("8-bit palette gray round-trips bit-exactly (row padding, bottom-up order)") {
    // widths 3/6/13 exercise every 4-byte row-padding remainder
    for (w <- Seq(3, 4, 6, 13); h <- Seq(1, 2, 9)) {
      val img = grayImage(w, h)((x, y) => (x * 31 + y * 17) % 256)
      val got = BmpDecoder.decodeBmp(encodeBmp(img)).get
      assert((got.width, got.height) === ((w, h)))
      val expect = Array.tabulate(w * h)(i => (i % w * 31 + i / w * 17) % 256)
      assert(got.gray === expect, s"$w x $h")
    }
  }

  test("24-bit RGB collapses to BT.601 luminance") {
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    val colors = Array(0xcc2244, 0x22cc44, 0x2244cc, 0x777777)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, colors(x / 4 % 4))
    val got = BmpDecoder.decodeBmp(encodeBmp(img)).get
    val lumas = colors.map(c =>
      (((c >> 16) & 0xff) * 299 + ((c >> 8) & 0xff) * 587 + (c & 0xff) * 114) / 1000)
    for (y <- 0 until 8; x <- 0 until 16)
      assert(got.gray(y * 16 + x) === lumas(x / 4 % 4), s"($x,$y)")
  }

  test("malformed inputs return None, never throw; fuzz totality") {
    val valid = encodeBmp(grayImage(16, 16)((x, y) => x * y))
    assert(BmpDecoder.decodeBmp(null).isEmpty)
    assert(BmpDecoder.decodeBmp(Array[Byte]()).isEmpty)
    assert(BmpDecoder.decodeBmp("definitely not a bitmap here".getBytes).isEmpty)
    for (cut <- Seq(10, 53, valid.length - 3))
      assert(BmpDecoder.decodeBmp(valid.take(cut)).isEmpty, s"cut $cut")
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val mutated = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      BmpDecoder.decodeBmp(mutated) // any result — just no throw/hang
    }
  }

  test("decodeImage sniffs BMP alongside the other formats") {
    val bmp = encodeBmp(grayImage(12, 6)((x, y) => x + y))
    assert(Multimodal.decodeImage(bmp).exists(i => i.width == 12 && i.height == 6))
  }
}
