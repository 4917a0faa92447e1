package graft.multimodal

import graft.multimodal.Multimodal.RasterImage

import java.nio.charset.StandardCharsets.US_ASCII

/**
 * Pure-Scala GIF decoder — implemented from the PUBLIC GIF
 * specification (CompuServe GIF87a/GIF89a, the format every browser
 * ships) with no codec libraries:
 *
 *  - header + logical screen descriptor + global color table;
 *  - extension blocks (0x21: graphic control, comment, application)
 *    skipped by sub-block walking;
 *  - the FIRST image descriptor (0x2C): local color table precedence,
 *    interlace (the 8/8/4/2-row four-pass order), and the LZW-
 *    compressed index stream — variable code width 3..12 bits read
 *    LSB-first across data sub-blocks, clear/end codes, 4096-entry
 *    dictionary of (prefix, appended byte) pairs;
 *  - palette → luminance with the same integer BT.601 weights as the
 *    PNG/Netpbm decoders (gray palettes — r=g=b — are exact, making
 *    the format LOSSLESS for gray rasters and the round-trip oracle
 *    form available);
 *  - animations: the first frame IS the image for feature/dedup
 *    purposes — later frames are not read;
 *  - None on malformed/truncated input — never throws.
 *
 * Validated against the JDK's independent ImageIO GIF codec in
 * GifDecoderSpec (bit-identical on gray rasters, which GIF encodes
 * losslessly).
 */
object GifDecoder {

  /** Safety bound on crafted headers: refuse > 64M-pixel rasters. */
  private val MaxPixels = 64 * 1024 * 1024

  private object Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw Malformed

  def decodeGif(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 13) return None
    try Some(run(payload))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def run(b: Array[Byte]): RasterImage = {
    var pos = 0
    def u8(): Int = { if (pos >= b.length) fail(); val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) } // GIF is little-endian

    if (b.length < 6) fail()
    val sig = new String(b, 0, 6, US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") fail()
    pos = 6

    def readPalette(n: Int): Array[Int] = Array.fill(n) {
      val r = u8(); val g = u8(); val bl = u8()
      (r << 16) | (g << 8) | bl
    }

    u16(); u16() // logical screen dims (frame dims come from the descriptor)
    val screenFlags = u8()
    u8(); u8() // background color index, pixel aspect ratio
    val globalPal =
      if ((screenFlags & 0x80) != 0) readPalette(2 << (screenFlags & 7)) else null

    def skipSubBlocks(): Unit = {
      var n = u8()
      while (n != 0) {
        pos += n
        if (pos > b.length) fail()
        n = u8()
      }
    }

    // ---- block walk to the first image descriptor ----
    while (true) {
      u8() match {
        case 0x21 => u8(); skipSubBlocks() // extension: label + sub-blocks
        case 0x2c => return decodeFrame()
        case _ => fail() // trailer (0x3b) before any image, or junk
      }
    }

    def decodeFrame(): RasterImage = {
      u16(); u16() // frame offset within the logical screen
      val width = u16()
      val height = u16()
      if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) fail()
      val frameFlags = u8()
      val interlaced = (frameFlags & 0x40) != 0
      val palette =
        if ((frameFlags & 0x80) != 0) readPalette(2 << (frameFlags & 7))
        else if (globalPal != null) globalPal
        else fail()

      // concatenate the LZW data sub-blocks
      val minCodeSize = u8()
      if (minCodeSize < 2 || minCodeSize > 11) fail()
      val data = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) {
        if (pos + n > b.length) fail()
        data.write(b, pos, n)
        pos += n
        n = u8()
      }
      val lzw = data.toByteArray

      // ---- LZW decode (LSB-first variable-width codes) ----
      val clear = 1 << minCodeSize
      val end = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val stack = new Array[Byte](4097)
      val indices = new Array[Byte](width * height)
      var outPos = 0
      var bitPos = 0
      def readCode(w: Int): Int = {
        var v = 0
        var i = 0
        while (i < w) {
          val byteIdx = bitPos >> 3
          if (byteIdx >= lzw.length) fail() // ran out before end code
          v |= (((lzw(byteIdx) >> (bitPos & 7)) & 1) << i)
          bitPos += 1
          i += 1
        }
        v
      }
      var codeWidth = minCodeSize + 1
      var next = end + 1
      var prev = -1
      var first = 0 // first byte of the previously emitted string
      var done = false
      while (!done && outPos < indices.length) {
        val code = readCode(codeWidth)
        if (code == clear) {
          codeWidth = minCodeSize + 1
          next = end + 1
          prev = -1
        } else if (code == end) {
          done = true
        } else if (prev == -1) {
          if (code >= clear) fail() // first code after a clear must be a root
          indices(outPos) = code.toByte
          outPos += 1
          prev = code
          first = code
        } else {
          // expand onto the stack (reversed); the not-yet-defined code
          // `next` means string(prev) + firstByte(string(prev)) — push
          // that trailing byte first, then walk prev's chain
          var sp = 0
          var cur = code
          if (code >= next) {
            if (code != next) fail()
            stack(sp) = first.toByte; sp += 1
            cur = prev
          }
          while (cur >= clear + 2) { // walk the chain down to a root
            stack(sp) = suffix(cur); sp += 1
            if (sp > 4096) fail()
            cur = prefix(cur)
          }
          if (cur >= clear) fail()
          first = cur // the root = first byte of this emission
          stack(sp) = cur.toByte; sp += 1
          // emit (stack holds the string reversed)
          while (sp > 0 && outPos < indices.length) {
            sp -= 1
            indices(outPos) = stack(sp)
            outPos += 1
          }
          // define the next dictionary entry: string(prev) + first
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = first.toByte
            next += 1
            if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prev = code
        }
      }
      if (outPos < indices.length) fail() // truncated stream

      // ---- de-interlace + palette → BT.601 luminance ----
      val gray = new Array[Int](width * height)
      val rowOrder: Seq[Int] =
        if (!interlaced) 0 until height
        else (0 until height by 8) ++ (4 until height by 8) ++
          (2 until height by 4) ++ (1 until height by 2)
      var srcRow = 0
      rowOrder.foreach { destRow =>
        var x = 0
        while (x < width) {
          val idx = indices(srcRow * width + x) & 0xff
          if (idx >= palette.length) fail()
          val rgb = palette(idx)
          gray(destRow * width + x) =
            (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
          x += 1
        }
        srcRow += 1
      }
      RasterImage(width, height, gray)
    }

    fail() // unreachable
  }
}
