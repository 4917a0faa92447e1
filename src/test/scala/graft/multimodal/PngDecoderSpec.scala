package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/**
 * PNG is lossless, so every comparison here is EXACT — no tolerance
 * anywhere. Ground truth comes from two independent directions: images
 * round-tripped through the JDK's own ImageIO PNG codec must decode to
 * the BT.601 luminance of the ORIGINAL pixels, and hand-crafted PNG
 * byte streams (chunk layout, CRCs, and per-row filter bytes written
 * directly from the spec) must reconstruct the raster they encode.
 */
class PngDecoderSpec extends AnyFunSuite {

  private def lumaOf(r: Int, g: Int, b: Int): Int = (r * 299 + g * 587 + b * 114) / 1000

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  // ---- hand-crafted PNG construction (spec chunk layout + CRC) ----

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be32(v: Int): Unit =
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    be32(data.length)
    val typeBytes = ctype.getBytes("US-ASCII")
    out.write(typeBytes)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typeBytes)
    crc.update(data)
    be32(crc.getValue.toInt)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf)
    assert(d.finished())
    d.end()
    buf.take(n)
  }

  /** Build a complete PNG from raw (already filter-applied) scanlines. */
  private def buildPng(w: Int, h: Int, colorType: Int, scanlines: Array[Byte],
      plte: Option[Array[Byte]] = None, bitDepth: Int = 8,
      interlace: Int = 0): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val out = new ByteArrayOutputStream()
    out.write(sig)
    out.write(chunk("IHDR", ihdr))
    plte.foreach(p => out.write(chunk("PLTE", p)))
    out.write(chunk("IDAT", deflate(scanlines)))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  test("ImageIO gray round-trip decodes bit-exact") {
    val img = new BufferedImage(23, 11, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 11; x <- 0 until 23)
      img.getRaster.setSample(x, y, 0, (x * 31 + y * 7) % 256)
    val got = PngDecoder.decodePng(encodePng(img)).get
    assert((got.width, got.height) === ((23, 11)))
    for (y <- 0 until 11; x <- 0 until 23)
      assert(got.gray(y * 23 + x) === (x * 31 + y * 7) % 256, s"($x,$y)")
  }

  test("ImageIO RGB round-trip decodes to exact BT.601 luminance of the source") {
    val img = new BufferedImage(16, 9, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 28) << 8) | ((x * y * 3) & 0xff))
    val got = PngDecoder.decodePng(encodePng(img)).get
    for (y <- 0 until 9; x <- 0 until 16) {
      val rgb = img.getRGB(x, y)
      assert(got.gray(y * 16 + x) ===
        lumaOf((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff), s"($x,$y)")
    }
  }

  test("ImageIO RGBA round-trip: alpha channel parsed and ignored") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, ((x * 30) << 24) | (200 << 16) | ((y * 25) << 8) | 40)
    val got = PngDecoder.decodePng(encodePng(img)).get
    for (y <- 0 until 8; x <- 0 until 8)
      assert(got.gray(y * 8 + x) === lumaOf(200, y * 25, 40), s"($x,$y)")
  }

  test("all five filter types unfilter exactly (hand-crafted rows)") {
    // 4x5 grayscale; row y carries filter type y. Source raster:
    val w = 4
    val src = Array(
      Array(10, 20, 30, 40), // filter 0 None
      Array(15, 35, 30, 90), // filter 1 Sub
      Array(12, 40, 33, 95), // filter 2 Up
      Array(50, 60, 70, 80), // filter 3 Average
      Array(55, 65, 75, 85)) // filter 4 Paeth
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pa = math.abs(b - c); val pb = math.abs(a - c); val pc = math.abs(a + b - 2 * c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // FORWARD-filter the rows exactly per spec §6 so the decoder must
    // invert all five reconstruction functions to get `src` back.
    val lines = new ByteArrayOutputStream()
    for (y <- src.indices) {
      lines.write(y) // filter byte
      for (x <- 0 until w) {
        val cur = src(y)(x)
        val left = if (x > 0) src(y)(x - 1) else 0
        val up = if (y > 0) src(y - 1)(x) else 0
        val upLeft = if (y > 0 && x > 0) src(y - 1)(x - 1) else 0
        val filtered = y match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        lines.write(filtered & 0xff)
      }
    }
    val got = PngDecoder.decodePng(buildPng(w, src.length, 0, lines.toByteArray)).get
    assert((got.width, got.height) === ((w, src.length)))
    for (y <- src.indices; x <- 0 until w)
      assert(got.gray(y * w + x) === src(y)(x), s"($x,$y) filter $y")
  }

  test("palette (color type 3) resolves PLTE entries to luminance") {
    // 3 palette entries; 4x2 image of indices
    val plte = Array[Byte](
      255.toByte, 0, 0, // red    -> luma 76
      0, 255.toByte, 0, // green  -> luma 149
      0, 0, 255.toByte) // blue   -> luma 29
    val idx = Array(Array(0, 1, 2, 1), Array(2, 2, 0, 0))
    val lines = new ByteArrayOutputStream()
    idx.foreach { row => lines.write(0); row.foreach(lines.write) }
    val got = PngDecoder.decodePng(
      buildPng(4, 2, 3, lines.toByteArray, plte = Some(plte))).get
    val expect = Map(0 -> lumaOf(255, 0, 0), 1 -> lumaOf(0, 255, 0), 2 -> lumaOf(0, 0, 255))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(got.gray(y * 4 + x) === expect(idx(y)(x)), s"($x,$y)")
  }

  test("encodeGray round trip is the identity, and the JDK decodes our output") {
    val pixels = Array.tabulate(6 * 8)(i => ((i * 37 + 11) % 256).toByte)
    val bytes = PngDecoder.encodeGray(6, 8, pixels)
    // our decoder inverts our encoder exactly
    val got = PngDecoder.decodePng(bytes).get
    assert((got.width, got.height) === ((6, 8)))
    assert(got.gray.toSeq === pixels.toSeq.map(_ & 0xff))
    // and the INDEPENDENT JDK codec accepts and agrees on the file
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((jdk.getWidth, jdk.getHeight) === ((6, 8)))
    for (y <- 0 until 8; x <- 0 until 6)
      assert(jdk.getRaster.getSample(x, y, 0) === (pixels(y * 6 + x) & 0xff))
  }

  test("malformed inputs return None: bad CRC, truncation, 16-bit, interlaced") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    val valid = encodePng(img)
    assert(PngDecoder.decodePng(valid).isDefined) // sanity
    assert(PngDecoder.decodePng(null).isEmpty)
    assert(PngDecoder.decodePng("not a png".getBytes).isEmpty)
    assert(PngDecoder.decodePng(valid.dropRight(10)).isEmpty) // truncated
    val corrupt = valid.clone()
    corrupt(40) = (corrupt(40) ^ 0x01).toByte // flip a bit inside a chunk
    assert(PngDecoder.decodePng(corrupt).isEmpty) // CRC catches it
    // unsupported-but-well-formed variants, CRC-correct by construction
    val rows = new ByteArrayOutputStream()
    for (_ <- 0 until 2) { rows.write(0); (0 until 2).foreach(_ => rows.write(7)) }
    assert(PngDecoder.decodePng(
      buildPng(2, 2, 0, rows.toByteArray, bitDepth = 16)).isEmpty)
    assert(PngDecoder.decodePng(
      buildPng(2, 2, 0, rows.toByteArray, interlace = 1)).isEmpty)
  }

  test("decoder is total under deterministic byte fuzzing") {
    // same crawl-grade contract as the JPEG fuzz spec: corrupted bytes
    // claiming to be PNG must return (Some or None), never throw/hang
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (x * y) % 256)
    val valid = encodePng(img)
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 300) {
      val mutated = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      PngDecoder.decodePng(mutated)
    }
    for (len <- 1 until valid.length by 5) PngDecoder.decodePng(valid.take(len))
  }

  test("decodeImage sniffs PNG alongside Netpbm and JPEG") {
    val img = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6) img.getRaster.setSample(x, y, 0, x + y)
    assert(Multimodal.decodeImage(encodePng(img)).exists(r =>
      r.width == 6 && r.height == 4 && r.gray.toSeq ==
        (for (y <- 0 until 4; x <- 0 until 6) yield x + y)))
  }

  test("textChunks: tEXt/zTXt/iTXt round-trip with real CRC and deflate") {
    val base = PngDecoder.encodeGray(4, 4, Array.fill[Byte](16)(7))
    val png = PngDecoder.withTextChunks(base, Seq(
      ("tEXt", "Title", "plain value"),
      ("zTXt", "Author", "compressed value with repetition repetition"),
      ("iTXt", "Comment", "utf8 \u00e9\u4e2d")))
    val got = PngDecoder.textChunks(png).get
    assert(got.map(t => (t.kind, t.keyword, t.value)) === Seq(
      ("tEXt", "Title", "plain value"),
      ("zTXt", "Author", "compressed value with repetition repetition"),
      ("iTXt", "Comment", "utf8 \u00e9\u4e2d")))
    assert(got.forall(_.crc_ok))
    // the image still decodes (text chunks are ancillary)
    assert(PngDecoder.decodePng(png).isDefined)
  }

  test("textChunks: corrupt text CRC flags crc_ok=false, walk continues") {
    val base = PngDecoder.encodeGray(2, 2, Array.fill[Byte](4)(1))
    val png = PngDecoder.withTextChunks(base,
      Seq(("tEXt", "K1", "v1"), ("tEXt", "K2", "v2")))
    // flip one byte inside the FIRST tEXt payload (after sig+IHDR+8)
    val off = 8 + 25 + 8 + 2 // into "K1\0v1"
    val bad = png.clone(); bad(off) = (bad(off) ^ 0x01).toByte
    val got = PngDecoder.textChunks(bad).get
    assert(got.length === 2)
    assert(!got.head.crc_ok)
    assert(got(1).crc_ok && got(1).keyword === "K2")
  }

  test("textChunks: non-PNG and truncated inputs -> None") {
    assert(PngDecoder.textChunks(null).isEmpty)
    assert(PngDecoder.textChunks("not a png at all".getBytes).isEmpty)
    val base = PngDecoder.encodeGray(2, 2, Array.fill[Byte](4)(1))
    val png = PngDecoder.withTextChunks(base, Seq(("tEXt", "K", "v")))
    for (cut <- 0 until png.length by 3)
      PngDecoder.textChunks(png.take(cut)) // totality
  }
}
