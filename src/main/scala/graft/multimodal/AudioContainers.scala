package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * FLAC and OGG container censuses — the audio members of the
 * decode-free triage family (MP3 frame walk, MP4 box walk, WEBP/TIFF,
 * TAR/ZIP): recover rate/channels/duration from container HEADERS,
 * never touching compressed payload bytes. Archived speech/music
 * corpora are dominated by exactly these two containers, and a 100 TB
 * curation pass sizes, routes and duration-buckets them long before
 * any codec runs.
 *
 * FLAC (the format the reference's vector corpus would meet first in
 * a speech-embedding pipeline): `fLaC` magic then metadata blocks,
 * each a 1-byte header (last-block flag in bit 7, 7-bit type) and a
 * 24-bit big-endian length. STREAMINFO (type 0, 34 bytes) packs, after
 * four u16/u24 block/frame-size fields, a 64-bit big-endian group:
 * 20-bit sample rate, 3-bit channels−1, 5-bit bits-per-sample−1,
 * 36-bit total samples; then a 16-byte MD5. The census walks ALL
 * metadata blocks (skipping PADDING/VORBIS_COMMENT/... by length
 * arithmetic) and reads only STREAMINFO — O(blocks).
 *
 * OGG: a sequence of `OggS` pages — version 0, header-type flags
 * (0x02 beginning-of-stream, 0x04 end-of-stream), 64-bit LE granule
 * position, serial / sequence / CRC u32s, a segment count and lacing
 * table whose sum is the payload length. The first page of a Vorbis
 * stream carries the identification header `\x01vorbis` with an 8-bit
 * channel count and 32-bit LE sample rate. The census walks the page
 * chain by lacing arithmetic (CRC deliberately NOT validated — triage
 * must survive bit-rot) and reports pages, flags, and the last
 * granule position, whose units are PCM samples → duration.
 *
 * Both parsers are TOTAL: malformed/truncated input → None, never a
 * throw (the one-bad-file-kills-a-task rule).
 */
object AudioContainers {

  final case class FlacMeta(
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      total_samples: Long, n_blocks: Int, duration_ms: Long)

  final case class OggMeta(
      codec: String, channels: Int, sample_rate: Long,
      n_pages: Int, last_granule: Long, duration_ms: Long)

  // ----------------------------------------------------------------- flac

  /** Build a minimal valid FLAC file: magic, STREAMINFO, and an
    * optional PADDING block (proves the block walk skips by length).
    * The audio frames that would follow are irrelevant to the census
    * and omitted. */
  def buildFlac(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, paddingBytes: Int = 0): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"20-bit rate: $sampleRate")
    require(channels >= 1 && channels <= 8, s"3-bit channels-1: $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"5-bit bps-1: $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"36-bit samples: $totalSamples")
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes(US_ASCII))
    // STREAMINFO header: type 0, last iff no padding follows
    out.write(if (paddingBytes > 0) 0x00 else 0x80)
    out.write(0); out.write(0); out.write(34)
    out.write(0x10); out.write(0x00) // min blocksize 4096
    out.write(0x10); out.write(0x00) // max blocksize 4096
    out.write(0); out.write(0); out.write(0) // min framesize unknown
    out.write(0); out.write(0); out.write(0) // max framesize unknown
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) |
      totalSamples
    var i = 7
    while (i >= 0) { out.write(((packed >>> (8 * i)) & 0xff).toInt); i -= 1 }
    out.write(new Array[Byte](16)) // md5 of the absent audio stream
    if (paddingBytes > 0) {
      out.write(0x81) // last-block flag + type 1 PADDING
      out.write((paddingBytes >>> 16) & 0xff)
      out.write((paddingBytes >>> 8) & 0xff)
      out.write(paddingBytes & 0xff)
      out.write(new Array[Byte](paddingBytes))
    }
    out.toByteArray
  }

  /** Census a FLAC file from its metadata blocks. None on anything
    * malformed — bad magic, truncated block, missing/short STREAMINFO,
    * a zero sample rate (forbidden by the spec for audio streams). */
  def parseFlac(bytes: Array[Byte]): Option[FlacMeta] = {
    if (bytes == null || bytes.length < 4) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    var p = 4
    var nBlocks = 0
    var meta: Option[FlacMeta] = None
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) return None // truncated block header
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val body = p + 4
      if (body + len > bytes.length) return None // truncated block body
      if (typ == 0) {
        if (len < 34) return None
        var packed = 0L
        var i = 0
        while (i < 8) { packed = (packed << 8) | (bytes(body + 10 + i) & 0xffL); i += 1 }
        val rate = (packed >>> 44).toInt
        val ch = ((packed >>> 41) & 0x7L).toInt + 1
        val bps = ((packed >>> 36) & 0x1fL).toInt + 1
        val samples = packed & ((1L << 36) - 1)
        if (rate == 0) return None
        meta = Some(FlacMeta(rate, ch, bps, samples, 0,
          samples * 1000L / rate))
      }
      nBlocks += 1
      p = body + len
    }
    meta.map(_.copy(n_blocks = nBlocks))
  }

  // ------------------------------------------------------------------ ogg

  private def le32(v: Long): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  private def oggPage(
      headerType: Int, granule: Long, serial: Long, seq: Long,
      payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 255 * 255, "single-page payload")
    val nSegs = payload.length / 255 + 1
    val lacing = new Array[Byte](nSegs)
    var rem = payload.length
    var i = 0
    while (i < nSegs) {
      lacing(i) = math.min(rem, 255).toByte
      rem -= math.min(rem, 255)
      i += 1
    }
    "OggS".getBytes(US_ASCII) ++ Array[Byte](0, headerType.toByte) ++
      le64(granule) ++ le32(serial) ++ le32(seq) ++ le32(0) /* crc unchecked */ ++
      Array(nSegs.toByte) ++ lacing ++ payload
  }

  /** Build a minimal Ogg Vorbis stream: a BOS page carrying the Vorbis
    * identification header, `nAudioPages` audio pages of filler
    * payload with evenly-spaced granule positions, the last flagged
    * EOS with `lastGranule`. */
  def buildOggVorbis(
      channels: Int, sampleRate: Long, nAudioPages: Int,
      lastGranule: Long, serial: Long = 0x1234L): Array[Byte] = {
    require(channels >= 1 && channels <= 255 && sampleRate >= 1 &&
      sampleRate <= 0xffffffffL && nAudioPages >= 1 && lastGranule >= 0)
    val ident = new ByteArrayOutputStream()
    ident.write(0x01)
    ident.write("vorbis".getBytes(US_ASCII))
    ident.write(le32(0L)) // vorbis version
    ident.write(channels)
    ident.write(le32(sampleRate))
    ident.write(le32(0L)); ident.write(le32(0L)); ident.write(le32(0L)) // bitrates
    ident.write(0xb8) // blocksizes 256/8192
    ident.write(0x01) // framing bit
    val out = new ByteArrayOutputStream()
    out.write(oggPage(0x02, 0L, serial, 0L, ident.toByteArray))
    var i = 1
    while (i <= nAudioPages) {
      val granule = lastGranule * i / nAudioPages
      val flags = if (i == nAudioPages) 0x04 else 0x00
      out.write(oggPage(flags, granule, serial, i.toLong, Array.fill[Byte](11)(0x55)))
      i += 1
    }
    out.toByteArray
  }

  /** Census an Ogg stream by walking its page chain. Requires a
    * well-formed BOS first page; reports the codec only when the BOS
    * payload is a Vorbis identification header (otherwise "unknown"
    * with zero channels/rate and no duration). None on malformed page
    * structure — the walk must consume every byte. */
  def parseOgg(bytes: Array[Byte]): Option[OggMeta] = {
    if (bytes == null || bytes.length < 27) return None
    var p = 0
    var nPages = 0
    var lastGranule = 0L
    var sawBos = false
    var sawEos = false
    var codec = "unknown"
    var channels = 0
    var rate = 0L
    while (p < bytes.length) {
      if (p + 27 > bytes.length) return None
      if (!(bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' &&
          bytes(p + 3) == 'S' && bytes(p + 4) == 0)) return None
      val flags = bytes(p + 5) & 0xff
      var granule = 0L
      var i = 7
      while (i >= 0) { granule = (granule << 8) | (bytes(p + 6 + i) & 0xffL); i -= 1 }
      val nSegs = bytes(p + 26) & 0xff
      if (p + 27 + nSegs > bytes.length) return None
      var payloadLen = 0
      i = 0
      while (i < nSegs) { payloadLen += bytes(p + 27 + i) & 0xff; i += 1 }
      val body = p + 27 + nSegs
      if (body + payloadLen > bytes.length) return None
      if (nPages == 0) {
        if ((flags & 0x02) == 0) return None // first page must be BOS
        sawBos = true
        // Vorbis identification header: \x01vorbis + version + ch + rate
        if (payloadLen >= 16 && bytes(body) == 0x01 &&
            new String(bytes, body + 1, 6, US_ASCII) == "vorbis") {
          codec = "vorbis"
          channels = bytes(body + 11) & 0xff
          rate = (bytes(body + 12) & 0xffL) | ((bytes(body + 13) & 0xffL) << 8) |
            ((bytes(body + 14) & 0xffL) << 16) | ((bytes(body + 15) & 0xffL) << 24)
        }
      }
      if ((flags & 0x04) != 0) sawEos = true
      if (granule >= 0) lastGranule = math.max(lastGranule, granule)
      nPages += 1
      p = body + payloadLen
    }
    if (!sawBos || !sawEos || nPages == 0) return None
    val durMs = if (codec == "vorbis" && rate > 0) lastGranule * 1000L / rate else 0L
    Some(OggMeta(codec, channels, rate, nPages, lastGranule, durMs))
  }
}
