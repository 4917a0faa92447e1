package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * WebM / Matroska (EBML) container census — with [[Mp4Parser]] this
 * covers both of the web's video containers, decode-free: doc type,
 * timestamp scale, and the track/codec inventory straight from EBML
 * element headers, payload never touched.
 *
 * EBML (RFC 8794): every element is (ID, size, body). Both ID and
 * size are VINTs — the count of leading zero bits in the first byte
 * gives the total byte length. IDs keep their marker bit (the spec
 * compares IDs with it); sizes strip it. A size of all value-bits-1
 * is "unknown" (streamed Segments use it) — legal here only on the
 * Segment, treated as extends-to-EOF.
 *
 * Walked elements: EBML header `1A45DFA3` → DocType `4282`;
 * Segment `18538067` → Info `1549A966` → TimestampScale `2AD7B1`
 * (uint, default 1,000,000 ns/tick); Tracks `1654AE6B` →
 * TrackEntry `AE` → TrackType `83` (1=video, 2=audio, 17=subtitle)
 * and CodecID `86` (string, "V_VP9"/"A_OPUS"/...). Unknown elements
 * are skipped by size arithmetic — O(elements), total on garbage.
 */
object WebmParser {

  final case class WebmMeta(
      doc_type: String, timestamp_scale: Long, n_tracks: Int,
      track_types: Seq[String], codec_ids: Seq[String])

  // ------------------------------------------------------------- builder

  private def vintSize(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 49), s"size vint range: $v")
    if (v < 127) Array((0x80 | v).toByte) // 126 max to avoid unknown-size
    else if (v < (1L << 14) - 1) Array((0x40 | (v >> 8)).toByte, v.toByte)
    else if (v < (1L << 21) - 1)
      Array((0x20 | (v >> 16)).toByte, (v >> 8).toByte, v.toByte)
    else Array((0x10 | (v >> 24)).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  }

  private def beBytes(id: Long): Array[Byte] = {
    // element IDs are written as their raw big-endian byte sequence
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def uintBody(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    beBytes(id) ++ vintSize(body.length.toLong) ++ body

  /** Build a minimal WebM: EBML header (DocType), Segment(Info
    * (TimestampScale), Tracks(TrackEntry(type, codec)…)), optional
    * unknown filler element inside the Segment (proves skipping). */
  def buildWebm(
      docType: String, timestampScale: Long,
      tracks: Seq[(Int, String)], fillerBytes: Int = 0,
      unknownSegmentSize: Boolean = false): Array[Byte] = {
    val header = el(0x1A45DFA3L, el(0x4282L, docType.getBytes(US_ASCII)))
    val info = el(0x1549A966L, el(0x2AD7B1L, uintBody(timestampScale)))
    val trackEntries = tracks.map { case (t, codec) =>
      el(0xAEL, el(0x83L, uintBody(t.toLong)) ++
        el(0x86L, codec.getBytes(US_ASCII)))
    }
    val trackBox = el(0x1654AE6BL, trackEntries.flatten.toArray)
    val filler = if (fillerBytes > 0) el(0xECL, new Array[Byte](fillerBytes)) // Void
      else Array.emptyByteArray
    val segBody = info ++ filler ++ trackBox
    val seg =
      if (unknownSegmentSize)
        beBytes(0x18538067L) ++ Array(0xffL.toByte) ++ segBody // 1-byte unknown vint
      else el(0x18538067L, segBody)
    header ++ seg
  }

  // -------------------------------------------------------------- parser

  /** Read a VINT at `p`: (value, width, allOnes). width 0 = malformed. */
  private def readVint(b: Array[Byte], p: Int): (Long, Int, Boolean) = {
    if (p >= b.length) return (0L, 0, false)
    val first = b(p) & 0xff
    if (first == 0) return (0L, 0, false) // >8-byte vint: out of scope
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width > 8 || p + width > b.length) return (0L, 0, false)
    var v = (first & (0xff >>> width)).toLong
    var ones = (first & (0xff >>> width)) == (0xff >>> width)
    var i = 1
    while (i < width) {
      v = (v << 8) | (b(p + i) & 0xffL)
      ones &&= (b(p + i) & 0xff) == 0xff
      i += 1
    }
    (v, width, ones)
  }

  /** Read an element ID at `p` (marker bit KEPT): (id, width). */
  private def readId(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) return (0L, 0)
    val first = b(p) & 0xff
    if (first == 0) return (0L, 0)
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width > 4 || p + width > b.length) return (0L, 0)
    var v = 0L
    var i = 0
    while (i < width) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, width)
  }

  private def readUint(b: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Census a WebM/Matroska stream. None on malformed EBML structure,
    * missing header/DocType/Segment, or an unknown-size element other
    * than the Segment. */
  def parseWebm(bytes: Array[Byte]): Option[WebmMeta] = {
    if (bytes == null || bytes.length < 8) return None
    var docType: Option[String] = None
    var scale = 1000000L // spec default
    var nTracks = 0
    val types = scala.collection.mutable.ArrayBuffer.empty[String]
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]

    // returns false on malformed
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var p = from
      while (p < until) {
        val (id, idW) = readId(bytes, p)
        if (idW == 0) return false
        val (size, szW, unknown) = readVint(bytes, p + idW)
        if (szW == 0) return false
        val body = p + idW + szW
        val end =
          if (unknown) {
            if (id != 0x18538067L) return false // unknown size: Segment only
            until
          } else {
            if (body + size > until) return false
            (body + size).toInt
          }
        id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xAEL =>
            if (id == 0xAEL) nTracks += 1
            if (!walk(body, end, depth + 1)) return false
          case 0x4282L =>
            docType = Some(new String(bytes, body, end - body, US_ASCII))
          case 0x2AD7B1L =>
            if (end - body > 8) return false
            scale = readUint(bytes, body, end)
          case 0x83L =>
            if (end - body > 8) return false
            types += (readUint(bytes, body, end) match {
              case 1 => "video"
              case 2 => "audio"
              case 17 => "subtitle"
              case other => s"type$other"
            })
          case 0x86L =>
            codecs += new String(bytes, body, end - body, US_ASCII)
          case _ => () // Void / unknown: skip by size
        }
        p = end
      }
      true
    }

    if (!walk(0, bytes.length, 0)) return None
    docType.map(dt =>
      WebmMeta(dt, scale, nTracks, types.toSeq, codecs.toSeq))
  }
}
