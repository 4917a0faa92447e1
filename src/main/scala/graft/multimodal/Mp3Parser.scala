package graft.multimodal

/**
 * MPEG audio (MP3) frame-header parser — metadata extraction WITHOUT
 * decode. The engine's documented boundary is that MP3 payload decode
 * falls back to byte histograms (no independent codec exists to
 * validate a pure-Scala polyphase/MDCT against); but corpus TRIAGE at
 * 100 TB never decodes anyway: it walks frame headers to census
 * bitrate/samplerate/duration and route/filter/bucket files before any
 * expensive stage. That walk is pure public structure (ISO 11172-3
 * frame sync + the tabulated bitrate/samplerate indices), exact, and
 * cheap — this parser provides it.
 *
 *  - optional ID3v2 tag skip ('ID3' + 4-byte syncsafe size);
 *  - per frame: 11-bit sync, MPEG version (1/2/2.5), layer (I/II/III),
 *    bitrate index, samplerate index, padding bit;
 *  - frame length recomputed from the tables (Layer I:
 *    (12·kbps·1000/rate + pad)·4; II/III: coef·kbps·1000/rate + pad
 *    with coef 144 (MPEG-1) or 72 (MPEG-2/2.5 Layer III));
 *  - walks every frame, requires ≥ `minFrames` valid frames and
 *    consistent version/layer, sums exact sample counts;
 *  - None on anything malformed — never throws (fuzz-pinned).
 */
object Mp3Parser {

  /** Census row: everything integer-exact. `bitrateKbps` is the FIRST
    * frame's nominal bitrate; `vbr` reports whether any later frame
    * declares a different index (triage needs the flag, not the mean).
    * `durationMs` = floor(totalSamples·1000 / sampleRate). */
  final case class Mp3Meta(
      version: String, layer: Int, bitrateKbps: Int, sampleRate: Int,
      frames: Int, vbr: Boolean, durationMs: Long)

  // MPEG-1 bitrate tables (kbps) by layer, index 1-14 (0 = free, 15 = bad).
  private val BitrateV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BitrateV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  // MPEG-2/2.5 tables.
  private val BitrateV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BitrateV2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SampleRateV1 = Array(44100, 48000, 32000, 0)
  private val SampleRateV2 = Array(22050, 24000, 16000, 0)
  private val SampleRateV25 = Array(11025, 12000, 8000, 0)

  /** Samples per frame by (version, layer). */
  private def samplesPerFrame(v: Int, layer: Int): Int = layer match {
    case 1 => 384
    case 2 => 1152
    case 3 => if (v == 1) 1152 else 576
    case _ => 0
  }

  def parseMp3(payload: Array[Byte], minFrames: Int = 1): Option[Mp3Meta] = {
    if (payload == null || payload.length < 4) return None
    try {
      var p = 0
      // ID3v2 prefix: 'ID3' + version(2) + flags(1) + syncsafe size(4).
      // The size field excludes the 10-byte header AND the 10-byte
      // footer; flags bit 4 declares the footer, so a tagged-with-
      // footer file skips 10 + size + 10 bytes (ID3v2.4 §3.1).
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
          payload(2) == '3') {
        val flags = payload(5) & 0xff
        var size = 0
        var i = 0
        while (i < 4) {
          val b = payload(6 + i) & 0xff
          if (b >= 0x80) return None // syncsafe bytes have bit 7 clear
          size = (size << 7) | b
          i += 1
        }
        p = 10 + size + (if ((flags & 0x10) != 0) 10 else 0)
        if (p >= payload.length) return None
      }
      var version = 0 // 1, 2, or 25 (for 2.5)
      var layer = 0
      var firstBitrate = -1
      var sampleRate = 0
      var vbr = false
      var frames = 0
      var totalSamples = 0L
      while (p + 4 <= payload.length) {
        val b0 = payload(p) & 0xff
        val b1 = payload(p + 1) & 0xff
        if (b0 != 0xff || (b1 & 0xe0) != 0xe0) {
          // first non-frame byte ends the walk (tag/garbage trailer)
          return result(version, layer, firstBitrate, sampleRate, frames, vbr,
            totalSamples, minFrames)
        }
        val v = ((b1 >> 3) & 0x3) match {
          case 3 => 1
          case 2 => 2
          case 0 => 25
          case _ => return None // reserved
        }
        val l = ((b1 >> 1) & 0x3) match {
          case 3 => 1
          case 2 => 2
          case 1 => 3
          case _ => return None // reserved
        }
        if (frames == 0) { version = v; layer = l }
        else if (v != version || l != layer) return None // inconsistent stream
        val b2 = payload(p + 2) & 0xff
        val bitrateIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
        val kbps = (v, l) match {
          case (1, 1) => BitrateV1L1(bitrateIdx)
          case (1, 2) => BitrateV1L2(bitrateIdx)
          case (1, 3) => BitrateV1L3(bitrateIdx)
          case (_, 1) => BitrateV2L1(bitrateIdx)
          case _      => BitrateV2L23(bitrateIdx)
        }
        val sr = v match {
          case 1  => SampleRateV1(srIdx)
          case 2  => SampleRateV2(srIdx)
          case 25 => SampleRateV25(srIdx)
        }
        if (frames == 0) { firstBitrate = kbps; sampleRate = sr }
        else if (sr != sampleRate) return None // mixed rates: not one stream
        else if (kbps != firstBitrate) vbr = true
        val frameLen =
          if (l == 1) (12 * kbps * 1000 / sr + padding) * 4
          else {
            val coef = if (l == 3 && v != 1) 72 else 144
            coef * kbps * 1000 / sr + padding
          }
        if (frameLen <= 4) return None
        if (p + frameLen > payload.length) return None // truncated final frame
        totalSamples += samplesPerFrame(v, l)
        frames += 1
        p += frameLen
      }
      result(version, layer, firstBitrate, sampleRate, frames, vbr,
        totalSamples, minFrames)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def result(
      version: Int, layer: Int, bitrate: Int, sampleRate: Int, frames: Int,
      vbr: Boolean, totalSamples: Long, minFrames: Int): Option[Mp3Meta] =
    if (frames < minFrames || sampleRate <= 0) None
    else Some(Mp3Meta(
      version match { case 1 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5" },
      layer, bitrate, sampleRate, frames, vbr,
      totalSamples * 1000L / sampleRate))

  // ------------------------------------------------- side info (L3)

  /** One granule-channel of MPEG-1 Layer III side information —
    * the decode-free CONTENT features (ISO 11172-3 §2.4.1.7):
    * `globalGain` is the granule's overall quantizer step, a direct
    * log-energy/loudness proxy; `part23Length` is the bit budget the
    * encoder spent (spectral complexity proxy); `bigValues` counts
    * the coded high-amplitude spectral pairs. Together they give
    * per-frame energy/complexity curves — silence detection, loudness
    * normalization, speech/music routing — without any MDCT. */
  final case class Mp3Granule(
      frameIdx: Int, granule: Int, channel: Int,
      part23Length: Int, bigValues: Int, globalGain: Int)

  /** MSB-first bit reader over a byte range. */
  private final class BitReader(buf: Array[Byte], off: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = off + ((bit + i) >> 3)
        val shift = 7 - ((bit + i) & 7)
        v = (v << 1) | ((buf(byteIdx) >> shift) & 1)
        i += 1
      }
      bit += n
      v
    }
    def skip(n: Int): Unit = bit += n
  }

  /**
   * Walk an MPEG-1 Layer III stream (optionally ID3v2-tagged, no CRC)
   * and parse every frame's side information. Returns one
   * [[Mp3Granule]] per (frame, granule, channel) — 2 granules ×
   * 1 (mono) or 2 (other modes) channels per frame. None on anything
   * malformed, non-MPEG-1, non-Layer-III, or CRC-protected (the
   * 2-byte CRC shifts the side info; triage skips those rather than
   * guessing) — never throws.
   */
  def parseGranules(payload: Array[Byte]): Option[Seq[Mp3Granule]] = {
    if (payload == null || payload.length < 4) return None
    try {
      var p = 0
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
          payload(2) == '3') {
        val flags = payload(5) & 0xff
        var size = 0
        var i = 0
        while (i < 4) {
          val b = payload(6 + i) & 0xff
          if (b >= 0x80) return None
          size = (size << 7) | b
          i += 1
        }
        p = 10 + size + (if ((flags & 0x10) != 0) 10 else 0)
        if (p >= payload.length) return None
      }
      val out = Seq.newBuilder[Mp3Granule]
      var frames = 0
      while (p + 4 <= payload.length) {
        val b0 = payload(p) & 0xff
        val b1 = payload(p + 1) & 0xff
        if (b0 != 0xff || (b1 & 0xe0) != 0xe0) {
          return if (frames >= 1) Some(out.result()) else None
        }
        if (((b1 >> 3) & 0x3) != 3) return None    // MPEG-1 only
        if (((b1 >> 1) & 0x3) != 1) return None    // Layer III only
        if ((b1 & 0x1) == 0) return None           // CRC-protected: skip
        val b2 = payload(p + 2) & 0xff
        val bitrateIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
        val kbps = BitrateV1L3(bitrateIdx)
        val sr = SampleRateV1(srIdx)
        val mode = (payload(p + 3) >> 6) & 0x3
        val nch = if (mode == 3) 1 else 2
        val sideBytes = if (nch == 1) 17 else 32
        if (p + 4 + sideBytes > payload.length) return None
        val r = new BitReader(payload, p + 4)
        r.skip(9)                                  // main_data_begin
        r.skip(if (nch == 1) 5 else 3)             // private_bits
        r.skip(4 * nch)                            // scfsi
        var g = 0
        while (g < 2) {
          var ch = 0
          while (ch < nch) {
            val part23 = r.read(12)
            val bigv = r.read(9)
            val gain = r.read(8)
            r.skip(4)                              // scalefac_compress
            // window_switching_flag + either branch of the window
            // layout — both are 22 bits (block_type 2 + mixed 1 +
            // 2×5 tables + 3×3 subblock gains vs 3×5 tables +
            // 4 region0 + 3 region1) — 23 bits total either way
            r.skip(23)
            r.skip(3)                              // preflag, sfscale, count1
            out += Mp3Granule(frames, g, ch, part23, bigv, gain)
            ch += 1
          }
          g += 1
        }
        val frameLen = 144 * kbps * 1000 / sr + padding
        if (frameLen <= 4) return None
        if (p + frameLen > payload.length) return None
        frames += 1
        p += frameLen
      }
      if (frames >= 1) Some(out.result()) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------------- ID3v2

  /** ID3v2 text metadata: the tag census the side-info rows skip.
    * Values are the tag's text frames, Latin-1 or UTF-16 decoded. */
  final case class Id3Meta(
      version: Int, title: String, artist: String, album: String,
      n_frames: Int)

  /** Build an ID3v2.3 or v2.4 tag followed by `audio` bytes: header
    * with syncsafe tag size, then TIT2/TPE1/TALB Latin-1 text frames
    * (v2.3 plain big-endian frame sizes, v2.4 syncsafe — the
    * compatibility trap this builder exists to exercise). */
  def buildId3(
      title: String, artist: String, album: String, v24: Boolean,
      audio: Array[Byte]): Array[Byte] = {
    def ss(v: Int): Array[Byte] = Array(
      ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    def be(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def frame(id: String, text: String): Array[Byte] = {
      val payload = 0.toByte +: text.getBytes("ISO-8859-1") // enc 0
      id.getBytes("ISO-8859-1") ++
        (if (v24) ss(payload.length) else be(payload.length)) ++
        Array[Byte](0, 0) ++ payload
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist) ++
      frame("TALB", album)
    "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](if (v24) 4 else 3, 0, 0) ++ ss(frames.length) ++
      frames ++ audio
  }

  /**
   * Parse the leading ID3v2.3/2.4 tag's text frames (TIT2 title,
   * TPE1 artist, TALB album — encoding bytes 0/3 Latin-1|UTF-8 and
   * 1 UTF-16-BOM handled). Frame sizes are syncsafe in v2.4, plain
   * big-endian in v2.3 — mixing them up misframes everything after
   * the first >127-byte frame, which is why the version switch is
   * explicit. None when no well-formed tag leads the payload.
   */
  def parseId3(bytes: Array[Byte]): Option[Id3Meta] = {
    if (bytes == null || bytes.length < 10) return None
    if (bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3') return None
    val ver = bytes(3) & 0xff
    if (ver != 3 && ver != 4) return None
    try {
      def ss(off: Int): Int = {
        var v = 0
        var i = 0
        while (i < 4) {
          val b = bytes(off + i) & 0xff
          if (b >= 0x80) return -1
          v = (v << 7) | b
          i += 1
        }
        v
      }
      def be(off: Int): Int =
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      val tagSize = ss(6)
      if (tagSize < 0 || 10 + tagSize > bytes.length) return None
      val end = 10 + tagSize
      var p = 10
      var title = ""; var artist = ""; var album = ""
      var n = 0
      while (p + 10 <= end && bytes(p) != 0) {
        val id = new String(bytes, p, 4, "ISO-8859-1")
        val fsize = if (ver == 4) ss(p + 4) else be(p + 4)
        if (fsize < 0 || p + 10 + fsize > end) return None
        if (id.startsWith("T") && fsize >= 1) {
          val enc = bytes(p + 10) & 0xff
          val txt = enc match {
            case 0 => new String(bytes, p + 11, fsize - 1, "ISO-8859-1")
            case 1 => new String(bytes, p + 11, fsize - 1, "UTF-16")
            case 3 => new String(bytes, p + 11, fsize - 1, "UTF-8")
            case _ => null
          }
          if (txt != null) {
            val t = txt.takeWhile(_ != '\u0000')
            id match {
              case "TIT2" => title = t
              case "TPE1" => artist = t
              case "TALB" => album = t
              case _ => ()
            }
          }
        }
        n += 1
        p += 10 + fsize
      }
      if (n < 1) None else Some(Id3Meta(ver, title, artist, album, n))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
