package graft.multimodal

/**
 * H.264/AVC Annex-B NAL-unit census — metadata extraction WITHOUT
 * decode, the video counterpart of [[Mp3Parser]]'s triage walk. The
 * engine's documented boundary is that H.264 SAMPLE decode stays on
 * the byte-histogram fallback (no independent codec exists in the
 * sandbox to validate a CABAC/transform chain against); but 100 TB
 * corpus triage never decodes video either: it walks the bitstream's
 * NAL framing to census stream structure — how many parameter sets,
 * how many IDR (random-access) vs non-IDR slices, which profile/level
 * — and routes/filters/buckets files before any expensive stage.
 *
 * Everything read is fixed-position public structure (ITU-T H.264
 * §B.1 byte-stream framing, §7.3.1 NAL header, §7.3.2.1 the first
 * three SPS payload bytes):
 *
 *  - start codes: both the 4-byte (00 00 00 01) and 3-byte (00 00 01)
 *    forms, anywhere in the stream; the stream must BEGIN with one;
 *  - NAL header: forbidden_zero_bit must be 0; nal_ref_idc (2 bits);
 *    nal_unit_type (5 bits) — censused for SPS (7), PPS (8), IDR
 *    slice (5), non-IDR slice (1);
 *  - SPS: profile_idc, constraint flags, level_idc are the first
 *    three payload bytes; width/height come from the §7.3.2.1.1
 *    Exp-Golomb walk over the de-escaped RBSP (emulation-prevention
 *    bytes removed per §7.4.1) — pic_width_in_mbs /
 *    pic_height_in_map_units / frame_mbs_only / frame_cropping, the
 *    one field set video triage actually routes on (thumbnail vs HD
 *    vs 4K buckets);
 *  - None on anything malformed — never throws (fuzz-pinned).
 *
 * The SAMPLE data (slice payloads) remains untouched: dims come from
 * parameter-set structure, not decode.
 */
object H264Parser {

  /** Census row: all integer-exact. `profile` names the common
    * profile_idc values; `nNal` counts every NAL unit framed;
    * `width`/`height` are the cropped luma dimensions from the first
    * SPS (§7.4.2.1.1 semantics). */
  final case class H264Meta(
      profile: String, profileIdc: Int, levelIdc: Int,
      width: Int, height: Int,
      nNal: Int, nSps: Int, nPps: Int, nIdr: Int, nNonIdr: Int)

  /** MSB-first bit reader with the two Exp-Golomb decoders (§9.1).
    * Overruns throw NoSuchElementException — callers catch to None. */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private def remaining: Int = bytes.length * 8 - pos
    def u1(): Int = {
      if (remaining < 1) throw new NoSuchElementException("bit overrun")
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(nBits: Int): Int = {
      var v = 0; var i = 0
      while (i < nBits) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw new NoSuchElementException("ue overrun")
      }
      if (zeros == 0) 0 else ((1 << zeros) | u(zeros)) - 1
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** §7.4.1: drop each emulation_prevention_three_byte (the 0x03 in
    * 00 00 03) to recover the RBSP from NAL payload bytes. */
  private def deEscape(payload: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var zeros = 0
    var i = from
    while (i < to) {
      val b = payload(i) & 0xff
      if (zeros >= 2 && b == 3) zeros = 0 // skip the escape byte
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** §7.3.2.1.1.1 scaling_list — values are discarded (the census
    * needs only to SKIP the right number of bits). */
  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8
    var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) nextScale = ((lastScale + r.se()) % 256 + 256) % 256
      if (nextScale != 0) lastScale = nextScale
      j += 1
    }
  }

  /** §7.3.2.1.1 seq_parameter_set_data walk over the de-escaped RBSP
    * (starting at profile_idc) → cropped (width, height). */
  private def parseSpsDims(rbsp: Array[Byte]): Option[(Int, Int)] = {
    try {
      val r = new BitReader(rbsp)
      val profileIdc = r.u(8)
      r.u(8) // constraint flags + reserved
      r.u(8) // level_idc
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1 // default 4:2:0 for non-High profiles
      var separateColourPlane = 0
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) separateColourPlane = r.u1()
        r.ue() // bit_depth_luma_minus8
        r.ue() // bit_depth_chroma_minus8
        r.u1() // qpprime_y_zero_transform_bypass_flag
        if (r.u1() == 1) { // seq_scaling_matrix_present_flag
          val nLists = if (chromaFormatIdc == 3) 12 else 8
          var i = 0
          while (i < nLists) {
            if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      val pocType = r.ue()
      if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (pocType == 1) {
        r.u1() // delta_pic_order_always_zero_flag
        r.se() // offset_for_non_ref_pic
        r.se() // offset_for_top_to_bottom_field
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed_flag
      val picWidthInMbs = r.ue() + 1
      val picHeightInMapUnits = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
      r.u1() // direct_8x8_inference_flag
      var cropL, cropR, cropT, cropB = 0
      if (r.u1() == 1) { // frame_cropping_flag
        cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
      }
      // §7.4.2.1.1: crop offsets are in chroma sample units
      val chromaArrayType = if (separateColourPlane == 1) 0 else chromaFormatIdc
      val subWidthC = if (chromaArrayType == 1 || chromaArrayType == 2) 2 else 1
      val subHeightC = if (chromaArrayType == 1) 2 else 1
      val cropUnitX = if (chromaArrayType == 0) 1 else subWidthC
      val cropUnitY =
        (if (chromaArrayType == 0) 1 else subHeightC) * (2 - frameMbsOnly)
      val width = picWidthInMbs * 16 - cropUnitX * (cropL + cropR)
      val height =
        (2 - frameMbsOnly) * picHeightInMapUnits * 16 - cropUnitY * (cropT + cropB)
      if (width <= 0 || height <= 0) None else Some((width, height))
    } catch { case _: RuntimeException => None }
  }

  /** §A.2 profile names for the idc values seen in the wild. */
  def profileName(idc: Int): String = idc match {
    case 66 => "Baseline"
    case 77 => "Main"
    case 88 => "Extended"
    case 100 => "High"
    case 110 => "High10"
    case 122 => "High422"
    case 244 => "High444"
    case other => s"P$other"
  }

  def parseAnnexB(payload: Array[Byte]): Option[H264Meta] = {
    if (payload == null || payload.length < 5) return None
    try {
      // NAL header offsets (byte after each start code), stream order.
      val starts = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      val n = payload.length
      while (i + 3 <= n) {
        if (payload(i) == 0 && payload(i + 1) == 0) {
          if (payload(i + 2) == 1) { starts += i + 3; i += 3 }
          else if (i + 4 <= n && payload(i + 2) == 0 && payload(i + 3) == 1) {
            starts += i + 4; i += 4
          } else i += 1
        } else i += 1
      }
      if (starts.isEmpty) return None
      // byte-stream must open with a start code (§B.1.1), 3- or 4-byte
      if (starts.head != 3 && starts.head != 4) return None
      var nSps, nPps, nIdr, nNonIdr = 0
      var profileIdc = -1
      var levelIdc = -1
      var width = -1
      var height = -1
      var k = 0
      while (k < starts.length) {
        val s = starts(k)
        if (s >= n) return None // start code at EOF with no header byte
        val header = payload(s) & 0xff
        if ((header & 0x80) != 0) return None // forbidden_zero_bit
        val end = if (k + 1 < starts.length) {
          // back off over the next start code (4-byte form has a 0 more)
          val next = starts(k + 1)
          next - (if (next >= 4 && payload(next - 4) == 0) 4 else 3)
        } else n
        (header & 0x1f) match {
          case 7 =>
            // profile_idc, constraints, level_idc: 3 fixed payload
            // bytes — must lie inside THIS NAL, not a sibling
            if (s + 4 > end) return None
            if (profileIdc < 0) {
              profileIdc = payload(s + 1) & 0xff
              levelIdc = payload(s + 3) & 0xff
              // dims: the Exp-Golomb SPS walk over the de-escaped RBSP
              parseSpsDims(deEscape(payload, s + 1, end)) match {
                case Some((w, h)) => width = w; height = h
                case None => return None // truncated/ill-formed SPS
              }
            }
            nSps += 1
          case 8 => nPps += 1
          case 5 => nIdr += 1
          case 1 => nNonIdr += 1
          case _ => () // censused in nNal only
        }
        k += 1
      }
      if (profileIdc < 0) return None // triage requires a parameter set
      Some(H264Meta(profileName(profileIdc), profileIdc, levelIdc,
        width, height, starts.length, nSps, nPps, nIdr, nNonIdr))
    } catch { case _: Exception => None }
  }

  /** MSB-first bit writer with the Exp-Golomb encoders — the builder
    * half of the SPS round trip. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def u(v: Int, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val x = v + 1
      val w = 32 - Integer.numberOfLeadingZeros(x)
      u(0, w - 1)
      u(x, w)
    }
    def rbspTrailing(): Unit = { u1(1); while (nBits != 0) u1(0) }
    def bytes: Array[Byte] = buf.toArray
  }

  /** §7.4.1 emulation prevention: insert 0x03 after any 00 00 run
    * followed by a byte ≤ 3 so RBSP bytes can never fake a start code. */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { byte =>
      val b = byte & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** A real §7.3.2.1.1 SPS payload (after the NAL header byte) for a
    * frame-coded 4:2:0 stream of the given CROPPED dimensions. The mb
    * grid rounds up to 16; the remainder is declared via
    * frame_cropping right/bottom offsets in chroma units, so width
    * may lose up to 14 even pixels and height up to 14 — callers
    * (and the oracle) use even dims, which round-trip exactly. */
  private def encodeSps(profileIdc: Int, levelIdc: Int,
      width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"even positive dims required, got ${width}x$height")
    val w = new BitWriter
    w.u(profileIdc, 8)
    w.u(0, 8) // constraint_set0..5 flags + reserved_zero_2bits
    w.u(levelIdc, 8)
    w.ue(0) // seq_parameter_set_id
    val highProfiles = Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
    if (highProfiles.contains(profileIdc)) {
      w.ue(1) // chroma_format_idc: 4:2:0
      w.ue(0) // bit_depth_luma_minus8
      w.ue(0) // bit_depth_chroma_minus8
      w.u1(0) // qpprime_y_zero_transform_bypass_flag
      w.u1(0) // seq_scaling_matrix_present_flag
    }
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type -> 0
    w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.u1(0) // gaps_in_frame_num_value_allowed_flag
    val mbsW = (width + 15) / 16
    val mbsH = (height + 15) / 16
    w.ue(mbsW - 1) // pic_width_in_mbs_minus1
    w.ue(mbsH - 1) // pic_height_in_map_units_minus1
    w.u1(1) // frame_mbs_only_flag
    w.u1(1) // direct_8x8_inference_flag
    val cropR = (mbsW * 16 - width) / 2 // CropUnitX = 2 (4:2:0)
    val cropB = (mbsH * 16 - height) / 2 // CropUnitY = 2*(2-1) = 2
    if (cropR > 0 || cropB > 0) {
      w.u1(1) // frame_cropping_flag
      w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u1(0)
    w.u1(0) // vui_parameters_present_flag
    w.rbspTrailing()
    escapeRbsp(w.bytes)
  }

  /** Assemble a minimal, spec-shaped Annex-B stream: 4-byte start
    * codes for parameter sets, 3-byte for slices (both forms must
    * parse). The SPS is a REAL §7.3.2.1.1 encoding of the given
    * cropped dimensions (Exp-Golomb fields + emulation prevention),
    * so the parser's bit walk is exercised end to end; slice payload
    * bytes are chosen with no 00-runs so no start-code emulation
    * arises there. */
  def buildAnnexB(profileIdc: Int, levelIdc: Int,
      nIdr: Int, nNonIdr: Int,
      width: Int = 320, height: Int = 240): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def nal(longCode: Boolean, refIdc: Int, typ: Int, body: Array[Int]): Unit = {
      if (longCode) bos.write(0)
      bos.write(0); bos.write(0); bos.write(1)
      bos.write(((refIdc & 3) << 5) | (typ & 0x1f))
      body.foreach(bos.write)
    }
    nal(longCode = true, 3, 7,
      encodeSps(profileIdc, levelIdc, width, height).map(_ & 0xff))
    nal(longCode = true, 3, 8, Array(0xce, 0x38, 0x80)) // PPS
    var f = 0
    while (f < nIdr) {
      nal(longCode = false, 3, 5, Array(0x25, 0x88, 0x84)); f += 1
    }
    f = 0
    while (f < nNonIdr) {
      nal(longCode = false, 2, 1, Array(0x9a, 0x3b, 0x41)); f += 1
    }
    bos.toByteArray
  }

  // ----------------------------------------------------- slice headers

  /** One coded slice's header prefix (§7.3.3): stream index among
    * slice NALs, nal_unit_type (1/5), slice_type, and its kind letter
    * (P/B/I/SP/SI — slice_type mod 5 per §7.4.3 Table 7-6). */
  final case class SliceInfo(
      idx: Int, nalType: Int, sliceType: Int, kind: String)

  /** Parse every coded-slice NAL's header prefix: first_mb_in_slice
    * (ue), slice_type (ue) — the decode-free GOP-structure signal
    * (I-frame cadence, B-frame usage) a video corpus routes on.
    * Returns slices in stream order; None when the stream is not
    * well-formed Annex-B or a slice header is truncated. */
  def parseSliceHeaders(payload: Array[Byte]): Option[Seq[SliceInfo]] = {
    if (payload == null || payload.length < 5) return None
    try {
      val starts = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      val n = payload.length
      while (i + 3 <= n) {
        if (payload(i) == 0 && payload(i + 1) == 0) {
          if (payload(i + 2) == 1) { starts += i + 3; i += 3 }
          else if (i + 4 <= n && payload(i + 2) == 0 && payload(i + 3) == 1) {
            starts += i + 4; i += 4
          } else i += 1
        } else i += 1
      }
      if (starts.isEmpty || (starts.head != 3 && starts.head != 4)) return None
      val out = Seq.newBuilder[SliceInfo]
      var idx = 0
      var k = 0
      while (k < starts.length) {
        val s = starts(k)
        if (s >= n) return None
        val header = payload(s) & 0xff
        if ((header & 0x80) != 0) return None
        val typ = header & 0x1f
        if (typ == 1 || typ == 5) {
          val end = if (k + 1 < starts.length) {
            val next = starts(k + 1)
            next - (if (next >= 4 && payload(next - 4) == 0) 4 else 3)
          } else n
          val r = new BitReader(deEscape(payload, s + 1, end))
          r.ue() // first_mb_in_slice
          val st = r.ue()
          if (st > 9) return None // §7.4.3: slice_type in 0..9
          val kind = (st % 5) match {
            case 0 => "P"; case 1 => "B"; case 2 => "I"
            case 3 => "SP"; case _ => "SI"
          }
          out += SliceInfo(idx, typ, st, kind)
          idx += 1
        }
        k += 1
      }
      val slices = out.result()
      if (slices.isEmpty) None else Some(slices)
    } catch { case _: Exception => None }
  }

  /** Build an Annex-B stream whose coded slices carry REAL §7.3.3
    * header prefixes (Exp-Golomb first_mb_in_slice=0, the given
    * slice_type, pps_id=0, then RBSP trailing) — slice_type mod 5 == 2
    * emits an IDR NAL (type 5), everything else non-IDR (type 1). */
  def buildAnnexBGop(
      profileIdc: Int, levelIdc: Int, sliceTypes: Seq[Int]): Array[Byte] = {
    require(sliceTypes.forall(t => t >= 0 && t <= 9), s"bad types $sliceTypes")
    val bos = new java.io.ByteArrayOutputStream()
    def nal(longCode: Boolean, refIdc: Int, typ: Int, body: Array[Byte]): Unit = {
      if (longCode) bos.write(0)
      bos.write(0); bos.write(0); bos.write(1)
      bos.write(((refIdc & 3) << 5) | (typ & 0x1f))
      body.foreach(b => bos.write(b & 0xff))
    }
    nal(longCode = true, 3, 7,
      encodeSps(profileIdc, levelIdc, 320, 240).map(b => (b & 0xff).toByte))
    nal(longCode = true, 3, 8, Array(0xce.toByte, 0x38.toByte, 0x80.toByte))
    sliceTypes.foreach { st =>
      val w = new BitWriter
      w.ue(0)  // first_mb_in_slice
      w.ue(st) // slice_type
      w.ue(0)  // pic_parameter_set_id
      w.rbspTrailing()
      val isI = st % 5 == 2
      nal(longCode = false, if (isI) 3 else 2, if (isI) 5 else 1,
        escapeRbsp(w.bytes))
    }
    bos.toByteArray
  }
}
