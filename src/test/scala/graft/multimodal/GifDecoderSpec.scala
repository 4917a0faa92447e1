package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO}

/**
 * Validated against the JDK's OWN GIF codec (javax.imageio — an
 * independent implementation of the same public format): encode a
 * raster with ImageIO, decode the bytes with [[GifDecoder]], compare.
 * GIF is LOSSLESS for gray rasters (the palette carries exact r=g=b
 * entries), so the comparison is bit-exact — no tolerance anywhere.
 */
class GifDecoderSpec extends AnyFunSuite {

  private def encodeGif(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
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

  private def imageIoGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    gray.getGraphics.drawImage(img, 0, 0, null)
    (w, h, Array.tabulate(w * h)(i => gray.getRaster.getSample(i % w, i / w, 0)))
  }

  test("gray gradient round-trips bit-exactly through the JDK encoder") {
    val img = grayImage(40, 24)((x, y) => (x * 5 + y * 3) % 256)
    val bytes = encodeGif(img)
    val got = GifDecoder.decodeGif(bytes).get
    val (w, h, expect) = imageIoGray(bytes)
    assert((got.width, got.height) === ((w, h)))
    assert(got.gray === expect)
    // and equals the ORIGINAL raster: gray GIF encode is lossless
    assert(got.gray === Array.tabulate(40 * 24)(i => (i % 40 * 5 + i / 40 * 3) % 256))
  }

  test("all-256-value raster exercises the full LZW dictionary growth") {
    // 256 distinct values + repetition drives code width 9→12 and the
    // code==next (KwKwK) case
    val img = grayImage(64, 64)((x, y) => (x * x + y * 7) % 256)
    val bytes = encodeGif(img)
    val got = GifDecoder.decodeGif(bytes).get
    val (_, _, expect) = imageIoGray(bytes)
    assert(got.gray === expect)
  }

  test("flat image (maximal LZW run) decodes exactly") {
    val img = grayImage(32, 32)((_, _) => 170)
    val got = GifDecoder.decodeGif(encodeGif(img)).get
    assert(got.gray.forall(_ === 170))
  }

  test("non-multiple-of-8 dimensions, tiny images (incl. tiny-interlace)") {
    // Ground truth is the ORIGINAL raster (gray GIF encode is
    // lossless). Deliberately NOT ImageIO's read here: the JDK writer
    // emits interlaced frames and the JDK READER mis-decodes
    // interlaced frames shorter than a full pass cycle (3x2 comes
    // back with a black second row) — our four-pass de-interlace
    // handles them correctly.
    for ((w, h) <- Seq((1, 1), (3, 2), (13, 9))) {
      val img = grayImage(w, h)((x, y) => (x * 31 + y * 17) % 256)
      val got = GifDecoder.decodeGif(encodeGif(img)).get
      assert((got.width, got.height) === ((w, h)))
      val expect = Array.tabulate(w * h)(i => (i % w * 31 + i / w * 17) % 256)
      assert(got.gray === expect, s"$w x $h")
    }
  }

  test("RGB image: palette resolves through BT.601 luminance") {
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    val colors = Array(0xcc2244, 0x22cc44, 0x2244cc, 0x777777)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, colors(x / 4 % 4))
    val bytes = encodeGif(img)
    val got = GifDecoder.decodeGif(bytes).get
    assert((got.width, got.height) === ((16, 8)))
    // expected luma of each palette color with integer BT.601 weights
    val lumas = colors.map(c =>
      (((c >> 16) & 0xff) * 299 + ((c >> 8) & 0xff) * 587 + (c & 0xff) * 114) / 1000)
    for (y <- 0 until 8; x <- 0 until 16)
      assert(got.gray(y * 16 + x) === lumas(x / 4 % 4), s"($x,$y)")
  }

  test("malformed inputs return None, never throw") {
    val valid = encodeGif(grayImage(16, 16)((x, y) => x * y))
    assert(GifDecoder.decodeGif(null).isEmpty)
    assert(GifDecoder.decodeGif(Array[Byte]()).isEmpty)
    assert(GifDecoder.decodeGif("GIF89a but junk".getBytes).isEmpty)
    assert(GifDecoder.decodeGif("not a gif at all".getBytes).isEmpty)
    for (cut <- Seq(5, 14, 30, valid.length - 3))
      assert(GifDecoder.decodeGif(valid.take(cut)).isEmpty, s"cut $cut")
  }

  test("decoder is total under deterministic byte fuzzing") {
    val valid = encodeGif(grayImage(24, 24)((x, y) => (x * y) % 256))
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 300) {
      val mutated = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      GifDecoder.decodeGif(mutated) // any result — just no throw/hang
    }
  }

  test("decodeImage sniffs GIF alongside the other formats") {
    val gif = encodeGif(grayImage(12, 6)((x, y) => x + y))
    assert(Multimodal.decodeImage(gif).exists(i => i.width == 12 && i.height == 6))
  }
}
