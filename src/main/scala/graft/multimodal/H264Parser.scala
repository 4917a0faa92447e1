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
 *    three payload bytes — BEFORE any Exp-Golomb field, so the walk
 *    stays fixed-offset and exact;
 *  - None on anything malformed — never throws (fuzz-pinned).
 */
object H264Parser {

  /** Census row: all integer-exact. `profile` names the common
    * profile_idc values; `nNal` counts every NAL unit framed. */
  final case class H264Meta(
      profile: String, profileIdc: Int, levelIdc: Int,
      nNal: Int, nSps: Int, nPps: Int, nIdr: Int, nNonIdr: Int)

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
        starts.length, nSps, nPps, nIdr, nNonIdr))
    } catch { case _: Exception => None }
  }

  /** Assemble a minimal, spec-shaped Annex-B stream: 4-byte start
    * codes for parameter sets, 3-byte for slices (both forms must
    * parse), payload bytes chosen with no 00-runs so no start-code
    * emulation arises. */
  def buildAnnexB(profileIdc: Int, levelIdc: Int,
      nIdr: Int, nNonIdr: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def nal(longCode: Boolean, refIdc: Int, typ: Int, body: Int*): Unit = {
      if (longCode) bos.write(0)
      bos.write(0); bos.write(0); bos.write(1)
      bos.write(((refIdc & 3) << 5) | (typ & 0x1f))
      body.foreach(bos.write)
    }
    // SPS: profile, constraint flags (none set), level, then a token
    // RBSP tail — the census reads only the first three payload bytes.
    nal(longCode = true, 3, 7, profileIdc, 0xc0, levelIdc, 0x2c, 0x89)
    nal(longCode = true, 3, 8, 0xce, 0x38, 0x80) // PPS
    var f = 0
    while (f < nIdr) { nal(longCode = false, 3, 5, 0x25, 0x88, 0x84); f += 1 }
    f = 0
    while (f < nNonIdr) { nal(longCode = false, 2, 1, 0x9a, 0x3b, 0x41); f += 1 }
    bos.toByteArray
  }
}
