package graft.multimodal

import graft.multimodal.Multimodal.RasterImage

/**
 * Pure-Scala baseline JPEG decoder — implemented from the PUBLIC JPEG
 * standard (ITU-T T.81 / ISO 10918-1) with no codec libraries:
 *
 *  - marker parse: SOI, APPn/COM (skipped), DQT (8/16-bit precision),
 *    DHT, DRI, SOF0/SOF1, SOS, RSTn, EOI;
 *  - canonical Huffman tables per Annex C code construction and the
 *    F.2.2.3 DECODE procedure (mincode/maxcode/valptr);
 *  - entropy-coded segment reading with 0xFF00 byte-stuffing and
 *    byte-aligned restart markers (DC predictors reset per interval);
 *  - per-MCU interleaved block decode (DC difference + RECEIVE/EXTEND,
 *    AC run-length with EOB/ZRL), dequantization, de-zigzag;
 *  - separable double-precision 8×8 inverse DCT, +128 level shift.
 *
 * Only the LUMINANCE plane is rasterized (the engine's image features
 * are luma-based); chroma blocks are entropy-decoded to keep the
 * bitstream in sync, then discarded — so subsampled color JPEGs decode
 * at full Y resolution without any upsampling step. Scope is honest
 * baseline: progressive (SOF2+), arithmetic coding, 12-bit precision,
 * hierarchical, and non-interleaved multi-scan files return None, as
 * does any malformed input — the decoder never throws.
 *
 * The reference treats media as opaque store payloads (binary columns;
 * /root/reference/app.py:157-162 is its only byte-level codec); image
 * decode is beyond-reference LLM-pipeline scope, same as the Netpbm /
 * WAV / Y4M decoders in [[Multimodal]].
 */
object JpegDecoder {

  /** Natural (row-major) coefficient index for each zigzag position. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(u)(x) = C(u)·cos((2x+1)uπ/16) — the 1-D IDCT basis. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Safety bound on crafted headers: refuse > 64M-pixel rasters. */
  private val MaxPixels = 64 * 1024 * 1024

  private object Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing =
    if (sys.props.contains("graft.jpeg.debug")) throw new RuntimeException("malformed")
    else throw Malformed

  /** Annex C canonical Huffman table: mincode/maxcode/valptr per length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        maxcode(l) = if (bits(l) > 0) code + bits(l) - 1 else -1
        code = (code + bits(l)) << 1
        k += bits(l)
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = {
      val idx = valptr(len) + code - mincode(len)
      if (idx < 0 || idx >= vals.length) fail()
      vals(idx)
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline JPEG payload to its luminance raster. */
  def decodeJpegBaseline(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 4) return None
    try Some(run(payload))
    catch { case scala.util.control.NonFatal(e) =>
      if (sys.props.contains("graft.jpeg.debug")) e.printStackTrace()
      None }
  }

  // ----------------------------------------------------------------- core

  private def run(payload: Array[Byte]): RasterImage = {
    var pos = 0
    def u8(): Int = {
      if (pos >= payload.length) fail()
      val v = payload(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    if (u16() != 0xffd8) fail() // SOI

    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    var comps: Array[Component] = null

    def parseDqt(): Unit = {
      val end = { val len = u16(); pos + len - 2 }
      while (pos < end) {
        val pqTq = u8()
        val pq = pqTq >> 4
        val tq = pqTq & 0x0f
        if (pq > 1 || tq > 3) fail()
        val table = new Array[Int](64)
        var i = 0
        while (i < 64) { table(i) = if (pq == 1) u16() else u8(); i += 1 }
        qt(tq) = table
      }
      if (pos != end) fail()
    }

    def parseDht(): Unit = {
      val end = { val len = u16(); pos + len - 2 }
      while (pos < end) {
        val tcTh = u8()
        val tc = tcTh >> 4
        val th = tcTh & 0x0f
        if (tc > 1 || th > 3) fail()
        val bits = new Array[Int](17)
        var total = 0
        var l = 1
        while (l <= 16) { bits(l) = u8(); total += bits(l); l += 1 }
        if (total > 256) fail()
        val vals = new Array[Int](total)
        var i = 0
        while (i < total) { vals(i) = u8(); i += 1 }
        val table = new HuffTable(bits, vals)
        if (tc == 0) dcTables(th) = table else acTables(th) = table
      }
      if (pos != end) fail()
    }

    def parseSof(): Unit = {
      val end = { val len = u16(); pos + len - 2 }
      if (u8() != 8) fail() // 8-bit precision only (baseline)
      height = u16()
      width = u16()
      val nc = u8()
      if (width <= 0 || height <= 0 || nc < 1 || nc > 4) fail()
      if (width.toLong * height > MaxPixels) fail()
      comps = Array.fill(nc) {
        val id = u8()
        val hv = u8()
        val h = hv >> 4
        val v = hv & 0x0f
        val tq = u8()
        if (h < 1 || h > 4 || v < 1 || v > 4 || tq > 3) fail()
        Component(id, h, v, tq)
      }
      if (pos != end) fail()
    }

    // ---- entropy-coded scan ----
    def decodeScan(): RasterImage = {
      val len = u16()
      val ns = u8()
      if (comps == null || ns != comps.length) fail() // single interleaved scan
      if (len != 6 + 2 * ns) fail()
      val scanSel = Array.fill(ns) {
        val cs = u8()
        val tdTa = u8()
        val ci = comps.indexWhere(_.id == cs)
        if (ci < 0) fail()
        (ci, tdTa >> 4, tdTa & 0x0f)
      }
      // Ss/Se/Ah/Al must be the baseline full-spectrum values.
      if (u8() != 0 || u8() != 63 || u8() != 0) fail()

      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // Luminance = SOF component 0 (JFIF: Y is always listed first).
      val luma = comps(0)
      val pw = mcusX * luma.h * 8
      val ph = mcusY * luma.v * 8
      if (pw.toLong * ph > 4L * MaxPixels) fail()
      val plane = new Array[Int](pw * ph)
      val preds = new Array[Int](comps.length)

      // bit reader over the entropy-coded segment (0xFF00 unstuffing)
      var cur = 0
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (pos >= payload.length) fail()
          val b = payload(pos) & 0xff; pos += 1
          if (b == 0xff) {
            if (pos >= payload.length) fail()
            if ((payload(pos) & 0xff) != 0x00) fail() // marker inside segment
            pos += 1
          }
          cur = b
          bitCnt = 8
        }
        bitCnt -= 1
        (cur >> bitCnt) & 1
      }
      def receive(s: Int): Int = {
        var v = 0
        var i = 0
        while (i < s) { v = (v << 1) | nextBit(); i += 1 }
        v
      }
      def extend(v: Int, s: Int): Int =
        if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      def decodeHuff(t: HuffTable): Int = {
        if (t == null) fail()
        var code = nextBit()
        var l = 1
        while (code > t.maxcode(l)) {
          code = (code << 1) | nextBit()
          l += 1
          if (l > 16) fail()
        }
        t.value(l, code)
      }

      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      val g = new Array[Double](64)

      def decodeBlock(ci: Int, td: Int, ta: Int, quant: Array[Int]): Unit = {
        java.util.Arrays.fill(coef, 0)
        val t = decodeHuff(dcTables(td))
        if (t > 15) fail()
        preds(ci) += extend(receive(t), t)
        coef(0) = preds(ci) * quant(0)
        var k = 1
        var done = false
        while (!done && k < 64) {
          val rs = decodeHuff(acTables(ta))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else done = true // EOB
          } else {
            k += r
            if (k > 63) fail()
            coef(ZigZag(k)) = extend(receive(s), s) * quant(k)
            k += 1
          }
        }
      }

      def idctInto(bx: Int, by: Int): Unit = {
        // rows (frequency u → spatial x), then columns (v → y)
        var v = 0
        while (v < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var u = 0
            while (u < 8) { acc += coef(v * 8 + u) * CosT(u)(x); u += 1 }
            g(v * 8 + x) = 0.5 * acc
            x += 1
          }
          v += 1
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var vv = 0
            while (vv < 8) { acc += g(vv * 8 + x) * CosT(vv)(y); vv += 1 }
            val px = (0.5 * acc + 128.0).round.toInt
            block(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
            x += 1
          }
          y += 1
        }
        val x0 = bx * 8
        val y0 = by * 8
        var yy = 0
        while (yy < 8) {
          System.arraycopy(block, yy * 8, plane, (y0 + yy) * pw + x0, 8)
          yy += 1
        }
      }

      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            bitCnt = 0 // byte-align
            if (pos + 1 >= payload.length || (payload(pos) & 0xff) != 0xff ||
              ((payload(pos + 1) & 0xff) < 0xd0) ||
              ((payload(pos + 1) & 0xff) > 0xd7)) fail()
            pos += 2
            java.util.Arrays.fill(preds, 0)
          }
          scanSel.foreach { case (ci, td, ta) =>
            val c = comps(ci)
            val quant = qt(c.tq)
            if (quant == null) fail()
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(ci, td, ta, quant)
                // only the luma plane is rasterized; other components'
                // blocks were decoded purely to advance the bitstream
                if (ci == 0) idctInto(mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }

      // Luma-resolution raster: sample the (possibly padded) Y plane.
      val gray = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val sy = y * luma.v / vMax
        var x = 0
        while (x < width) {
          gray(y * width + x) = plane(sy * pw + x * luma.h / hMax)
          x += 1
        }
        y += 1
      }
      RasterImage(width, height, gray)
    }

    // ---- marker loop ----
    while (true) {
      if (u8() != 0xff) fail()
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes before a marker are legal
      m match {
        case 0xc0 | 0xc1 => parseSof() // baseline / extended sequential
        case 0xc4 => parseDht()
        case 0xdb => parseDqt()
        case 0xdd => if (u16() != 4) fail() else restartInterval = u16()
        case 0xda => return decodeScan() // SOS: decode and finish
        case 0xd9 => fail() // EOI before any scan
        case 0x01 => () // TEM: standalone
        case m2 if m2 >= 0xd0 && m2 <= 0xd7 => () // stray RST: standalone
        case m2 if (m2 >= 0xc2 && m2 <= 0xcf) => fail() // progressive/arithmetic/hierarchical
        case _ =>
          val len = u16()
          if (len < 2 || pos + len - 2 > payload.length) fail()
          pos += len - 2 // APPn / COM / DNL / anything else with a length
      }
    }
    fail() // unreachable
  }
}
