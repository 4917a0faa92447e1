package graft.multimodal

import graft.multimodal.Multimodal.RasterImage

/**
 * Pure-Scala JPEG decoder — implemented from the PUBLIC JPEG standard
 * (ITU-T T.81 / ISO 10918-1) with no codec libraries:
 *
 *  - marker parse: SOI, APPn/COM (skipped), DQT (8/16-bit precision),
 *    DHT, DRI, SOF0/SOF1/SOF2, SOS, RSTn, EOI;
 *  - canonical Huffman tables per Annex C code construction and the
 *    F.2.2.3 DECODE procedure (mincode/maxcode/valptr);
 *  - entropy-coded segment reading with 0xFF00 byte-stuffing and
 *    byte-aligned restart markers (DC predictors reset per interval);
 *  - BASELINE path (SOF0/SOF1): per-MCU interleaved block decode (DC
 *    difference + RECEIVE/EXTEND, AC run-length with EOB/ZRL),
 *    dequantization, de-zigzag, streaming straight to the raster;
 *  - PROGRESSIVE path (SOF2, T.81 Annex G): per-component coefficient
 *    buffers refined across scans — DC first/refinement scans
 *    (successive approximation, interleaved or single-component), AC
 *    first scans with EOB-run codes (G.1.2.2), AC refinement scans
 *    with correction bits (G.1.2.3) — then one dequant + IDCT pass at
 *    EOI;
 *  - separable double-precision 8×8 inverse DCT, +128 level shift.
 *
 * Only the LUMINANCE plane is rasterized (the engine's image features
 * are luma-based); chroma blocks are entropy-decoded to keep the
 * bitstream in sync, then discarded — so subsampled color JPEGs decode
 * at full Y resolution without any upsampling step. Remaining honest
 * scope limits: arithmetic coding, 12-bit precision, hierarchical, and
 * interleaved component SUBSETS (an interleaved scan must carry every
 * frame component — what real encoders emit) return None, as does any
 * malformed input — the decoder never throws. Both paths are validated
 * against the JDK's independent ImageIO codec in JpegDecoderSpec.
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

  /** Byte cursor over the payload — shared by both decode paths. */
  private final class Cursor(val payload: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= payload.length) fail()
      val v = payload(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
  }

  /** Tables + frame header accumulated by the marker loop. */
  private final class Headers {
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    var comps: Array[Component] = null
  }

  private def parseDqt(c: Cursor, h: Headers): Unit = {
    val end = { val len = c.u16(); c.pos + len - 2 }
    while (c.pos < end) {
      val pqTq = c.u8()
      val pq = pqTq >> 4
      val tq = pqTq & 0x0f
      if (pq > 1 || tq > 3) fail()
      val table = new Array[Int](64)
      var i = 0
      while (i < 64) { table(i) = if (pq == 1) c.u16() else c.u8(); i += 1 }
      h.qt(tq) = table
    }
    if (c.pos != end) fail()
  }

  private def parseDht(c: Cursor, h: Headers): Unit = {
    val end = { val len = c.u16(); c.pos + len - 2 }
    while (c.pos < end) {
      val tcTh = c.u8()
      val tc = tcTh >> 4
      val th = tcTh & 0x0f
      if (tc > 1 || th > 3) fail()
      val bits = new Array[Int](17)
      var total = 0
      var l = 1
      while (l <= 16) { bits(l) = c.u8(); total += bits(l); l += 1 }
      if (total > 256) fail()
      val vals = new Array[Int](total)
      var i = 0
      while (i < total) { vals(i) = c.u8(); i += 1 }
      val table = new HuffTable(bits, vals)
      if (tc == 0) h.dcTables(th) = table else h.acTables(th) = table
    }
    if (c.pos != end) fail()
  }

  private def parseSof(c: Cursor, h: Headers): Unit = {
    val end = { val len = c.u16(); c.pos + len - 2 }
    if (c.u8() != 8) fail() // 8-bit precision only
    h.height = c.u16()
    h.width = c.u16()
    val nc = c.u8()
    if (h.width <= 0 || h.height <= 0 || nc < 1 || nc > 4) fail()
    if (h.width.toLong * h.height > MaxPixels) fail()
    h.comps = Array.fill(nc) {
      val id = c.u8()
      val hv = c.u8()
      val hh = hv >> 4
      val vv = hv & 0x0f
      val tq = c.u8()
      if (hh < 1 || hh > 4 || vv < 1 || vv > 4 || tq > 3) fail()
      Component(id, hh, vv, tq)
    }
    if (c.pos != end) fail()
  }

  /** In-place 8×8 IDCT of natural-order coefficients + level shift,
    * clamped to 0–255. `g` is scratch (64 doubles). */
  private def idct8x8(coef: Array[Int], g: Array[Double], out: Array[Int]): Unit = {
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
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** Decode a baseline (SOF0/SOF1) JPEG payload to its luminance
    * raster. Progressive payloads return None — use
    * [[decodeJpegProgressive]] or the sniffing [[decodeJpeg]]. */
  def decodeJpegBaseline(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 4) return None
    try Some(runBaseline(payload))
    catch { case scala.util.control.NonFatal(e) =>
      if (sys.props.contains("graft.jpeg.debug")) e.printStackTrace()
      None }
  }

  /** Decode a progressive (SOF2) JPEG payload to its luminance raster.
    * Baseline payloads return None. */
  def decodeJpegProgressive(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 4) return None
    try Some(runProgressive(payload))
    catch { case scala.util.control.NonFatal(e) =>
      if (sys.props.contains("graft.jpeg.debug")) e.printStackTrace()
      None }
  }

  /** Decode either JPEG flavor, dispatching on the SOF marker. */
  def decodeJpeg(payload: Array[Byte]): Option[RasterImage] =
    decodeJpegBaseline(payload).orElse(decodeJpegProgressive(payload))

  // ------------------------------------------------------- baseline core

  private def runBaseline(payload: Array[Byte]): RasterImage = {
    val cur = new Cursor(payload)
    val hdr = new Headers
    def u8(): Int = cur.u8()
    def u16(): Int = cur.u16()

    if (u16() != 0xffd8) fail() // SOI

    // ---- entropy-coded scan ----
    def decodeScan(): RasterImage = {
      import hdr._
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
      var curByte = 0
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (cur.pos >= payload.length) fail()
          val b = payload(cur.pos) & 0xff; cur.pos += 1
          if (b == 0xff) {
            if (cur.pos >= payload.length) fail()
            if ((payload(cur.pos) & 0xff) != 0x00) fail() // marker inside segment
            cur.pos += 1
          }
          curByte = b
          bitCnt = 8
        }
        bitCnt -= 1
        (curByte >> bitCnt) & 1
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
        idct8x8(coef, g, block)
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
            if (cur.pos + 1 >= payload.length || (payload(cur.pos) & 0xff) != 0xff ||
              ((payload(cur.pos + 1) & 0xff) < 0xd0) ||
              ((payload(cur.pos + 1) & 0xff) > 0xd7)) fail()
            cur.pos += 2
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
        case 0xc0 | 0xc1 => parseSof(cur, hdr) // baseline / extended sequential
        case 0xc4 => parseDht(cur, hdr)
        case 0xdb => parseDqt(cur, hdr)
        case 0xdd => if (u16() != 4) fail() else hdr.restartInterval = u16()
        case 0xda => return decodeScan() // SOS: decode and finish
        case 0xd9 => fail() // EOI before any scan
        case 0x01 => () // TEM: standalone
        case m2 if m2 >= 0xd0 && m2 <= 0xd7 => () // stray RST: standalone
        case m2 if (m2 >= 0xc2 && m2 <= 0xcf) => fail() // progressive/arithmetic/hierarchical
        case _ =>
          val len = u16()
          if (len < 2 || cur.pos + len - 2 > payload.length) fail()
          cur.pos += len - 2 // APPn / COM / DNL / anything else with a length
      }
    }
    fail() // unreachable
  }

  // ---------------------------------------------------- progressive core

  private def runProgressive(payload: Array[Byte]): RasterImage = {
    val cur = new Cursor(payload)
    val hdr = new Headers
    def u8(): Int = cur.u8()
    def u16(): Int = cur.u16()

    if (u16() != 0xffd8) fail() // SOI

    // Per-component coefficient grids, sized on the MCU-padded block
    // geometry so interleaved DC scans and non-interleaved AC scans
    // index the same storage. Allocated once, at SOF2.
    var coefs: Array[Array[Int]] = null
    var bw: Array[Int] = null // padded blocks per row
    var bh: Array[Int] = null
    var sbw: Array[Int] = null // non-interleaved (ceil-dims) blocks per row
    var sbh: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var hMax = 0
    var vMax = 0
    var sawScan = false

    def allocate(): Unit = {
      import hdr._
      hMax = comps.map(_.h).max
      vMax = comps.map(_.v).max
      mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      bw = comps.map(c => mcusX * c.h)
      bh = comps.map(c => mcusY * c.v)
      sbw = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
      sbh = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
      val totalCoefs = comps.indices.map(i => bw(i).toLong * bh(i) * 64).sum
      if (totalCoefs > 4L * MaxPixels) fail()
      coefs = comps.indices.map(i => new Array[Int](bw(i) * bh(i) * 64)).toArray
    }

    // A progressive scan: refine the coefficient grids per T.81 Annex G.
    def decodeScan(): Unit = {
      import hdr._
      if (comps == null) fail()
      val len = u16()
      val ns = u8()
      if (ns < 1 || ns > comps.length) fail()
      if (len != 6 + 2 * ns) fail()
      val scanSel = Array.fill(ns) {
        val cs = u8()
        val tdTa = u8()
        val ci = comps.indexWhere(_.id == cs)
        if (ci < 0) fail()
        (ci, tdTa >> 4, tdTa & 0x0f)
      }
      val ss = u8()
      val se = u8()
      val ahAl = u8()
      val ah = ahAl >> 4
      val al = ahAl & 0x0f
      if (ss > 63 || se > 63 || ss > se || al > 13) fail()
      val isDc = ss == 0
      if (isDc && se != 0) fail() // DC scans carry exactly coefficient 0
      if (!isDc && ns != 1) fail() // AC scans are single-component (G.1.1)
      if (ah != 0 && ah != al + 1) fail() // successive approximation steps by 1
      // Interleaved scans must carry every frame component (the honest
      // scope limit — what real encoders emit); single-component scans
      // iterate the component's own ceil-dims block grid.
      if (ns > 1 && ns != comps.length) fail()
      sawScan = true

      var curByte = 0
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (cur.pos >= payload.length) fail()
          val b = payload(cur.pos) & 0xff; cur.pos += 1
          if (b == 0xff) {
            if (cur.pos >= payload.length) fail()
            if ((payload(cur.pos) & 0xff) != 0x00) fail()
            cur.pos += 1
          }
          curByte = b
          bitCnt = 8
        }
        bitCnt -= 1
        (curByte >> bitCnt) & 1
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

      val preds = new Array[Int](comps.length)
      var eobrun = 0

      def restart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          bitCnt = 0 // byte-align
          if (cur.pos + 1 >= payload.length || (payload(cur.pos) & 0xff) != 0xff ||
            ((payload(cur.pos + 1) & 0xff) < 0xd0) ||
            ((payload(cur.pos + 1) & 0xff) > 0xd7)) fail()
          cur.pos += 2
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }

      // ---- DC band (Ss = Se = 0) ----
      def dcFirst(ci: Int, td: Int, base: Int): Unit = {
        val t = decodeHuff(dcTables(td))
        if (t > 15) fail()
        preds(ci) += extend(receive(t), t)
        coefs(ci)(base) = preds(ci) << al
      }
      def dcRefine(ci: Int, base: Int): Unit =
        if (nextBit() == 1) coefs(ci)(base) |= (1 << al)

      // ---- AC band first scan (G.1.2.2: EOBn run codes) ----
      def acFirst(arr: Array[Int], base: Int, ta: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = decodeHuff(acTables(ta))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              // EOBn: run of (1 << r) + appended-bits blocks ending here
              eobrun = (1 << r) - 1 + (if (r > 0) receive(r) else 0)
              done = true
            }
          } else {
            k += r
            if (k > se) fail()
            arr(base + ZigZag(k)) = extend(receive(s), s) << al
            k += 1
          }
        }
      }

      // ---- AC band refinement scan (G.1.2.3: correction bits) ----
      def acRefine(arr: Array[Int], base: Int, ta: Int): Unit = {
        val p1 = 1 << al
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = decodeHuff(acTables(ta))
            var r = rs >> 4
            val s = rs & 0x0f
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                // EOBn: this and the next (eobrun - 1) blocks have no
                // new nonzero coefficients; history still refines below
                eobrun = (1 << r) + (if (r > 0) receive(r) else 0)
                done = true
              }
              // r == 15 (ZRL): advance past 16 zero-history positions
            } else {
              if (s != 1) fail() // refinement codes one bit of magnitude
              newVal = if (nextBit() == 1) p1 else -p1
            }
            if (!done) {
              // move r zero-history positions forward, emitting a
              // correction bit for every nonzero coefficient passed
              var placed = false
              while (!placed && k <= se) {
                val idx = base + ZigZag(k)
                val c = arr(idx)
                if (c != 0) {
                  if (nextBit() == 1 && (c & p1) == 0)
                    arr(idx) = if (c >= 0) c + p1 else c - p1
                } else {
                  if (r == 0) {
                    if (s != 0) arr(idx) = newVal
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          // correction bits for the remaining nonzero history
          while (k <= se) {
            val idx = base + ZigZag(k)
            val c = arr(idx)
            if (c != 0) {
              if (nextBit() == 1 && (c & p1) == 0)
                arr(idx) = if (c >= 0) c + p1 else c - p1
            }
            k += 1
          }
          eobrun -= 1
        }
      }

      if (isDc && ns > 1) {
        // interleaved DC scan over MCUs
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restart(mcu)
            scanSel.foreach { case (ci, td, _) =>
              val c = comps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val base = ((my * c.v + by) * bw(ci) + (mx * c.h + bx)) * 64
                  if (ah == 0) dcFirst(ci, td, base) else dcRefine(ci, base)
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
      } else {
        // single-component scan (DC or AC) over the ceil-dims grid
        val (ci, td, ta) = scanSel(0)
        val arr = coefs(ci)
        var unit = 0
        var row = 0
        while (row < sbh(ci)) {
          var colIdx = 0
          while (colIdx < sbw(ci)) {
            restart(unit)
            val base = (row * bw(ci) + colIdx) * 64
            if (isDc) {
              if (ah == 0) dcFirst(ci, td, base) else dcRefine(ci, base)
            } else {
              if (ah == 0) acFirst(arr, base, ta) else acRefine(arr, base, ta)
            }
            unit += 1
            colIdx += 1
          }
          row += 1
        }
      }
    }

    // Dequantize + IDCT the accumulated luma coefficients into the
    // raster — the one spatial pass, at EOI.
    def finish(): RasterImage = {
      import hdr._
      if (!sawScan) fail()
      val luma = comps(0)
      val quant = qt(luma.tq)
      if (quant == null) fail()
      val pw = bw(0) * 8
      val ph = bh(0) * 8
      if (pw.toLong * ph > 4L * MaxPixels) fail()
      val plane = new Array[Int](pw * ph)
      val dq = new Array[Int](64)
      val block = new Array[Int](64)
      val g = new Array[Double](64)
      val arr = coefs(0)
      var by = 0
      while (by < bh(0)) {
        var bx = 0
        while (bx < bw(0)) {
          val base = (by * bw(0) + bx) * 64
          var k = 0
          while (k < 64) {
            dq(ZigZag(k)) = arr(base + ZigZag(k)) * quant(k)
            k += 1
          }
          idct8x8(dq, g, block)
          val x0 = bx * 8
          val y0 = by * 8
          var yy = 0
          while (yy < 8) {
            System.arraycopy(block, yy * 8, plane, (y0 + yy) * pw + x0, 8)
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
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

    // ---- marker loop (multi-scan: SOS decodes and continues) ----
    while (true) {
      if (u8() != 0xff) fail()
      var m = u8()
      while (m == 0xff) m = u8()
      m match {
        case 0xc2 =>
          if (coefs != null) fail() // one frame header
          parseSof(cur, hdr)
          allocate()
        case 0xc4 => parseDht(cur, hdr)
        case 0xdb => parseDqt(cur, hdr)
        case 0xdd => if (u16() != 4) fail() else hdr.restartInterval = u16()
        case 0xda => if (coefs == null) fail() else decodeScan()
        case 0xd9 => return finish() // EOI: all scans accumulated
        case 0x01 => ()
        case m2 if m2 >= 0xd0 && m2 <= 0xd7 => ()
        case m2 if m2 >= 0xc0 && m2 <= 0xcf => fail() // other SOF flavors
        case _ =>
          val len = u16()
          if (len < 2 || cur.pos + len - 2 > payload.length) fail()
          cur.pos += len - 2
      }
    }
    fail() // unreachable
  }
}
