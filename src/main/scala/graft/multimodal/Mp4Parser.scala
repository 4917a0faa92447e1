package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/**
 * MP4 / ISO-BMFF (ISO 14496-12) box-structure parser — the video
 * counterpart of [[Mp3Parser]]: corpus triage metadata (duration,
 * timescale, track count, handler types, codec fourccs) WITHOUT
 * decoding any sample data. H.264 payload decode stays on the
 * documented byte-histogram fallback; routing/filtering a 100 TB
 * video corpus needs exactly this container walk and nothing deeper.
 *
 *  - box = [size:u32][type:4cc][payload]; size includes the 8-byte
 *    header; size == 1 → 64-bit largesize follows; size == 0 (to end
 *    of file) accepted at top level only;
 *  - containers (moov, trak, mdia, minf, stbl) are walked recursively;
 *  - mvhd v0/v1: timescale + duration; hdlr: handler_type fourcc;
 *    stsd: sample-entry format fourccs (the codec ids);
 *  - None on malformed/truncated/overlapping boxes — never throws.
 */
object Mp4Parser {

  /** Triage row: integers exact; handler/codec lists sorted for
    * deterministic output. `durationMs` = floor(duration·1000 /
    * timescale). */
  final case class Mp4Meta(
      majorBrand: String, timescale: Long, duration: Long, durationMs: Long,
      tracks: Int, handlers: Seq[String], codecs: Seq[String])

  private object Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw Malformed

  def parseMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 16) return None
    try Some(run(payload))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private final class State {
    var brand: String = null
    var timescale: Long = -1
    var duration: Long = -1
    var tracks: Int = 0
    val handlers = new ArrayBuffer[String]()
    val codecs = new ArrayBuffer[String]()
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  private def run(b: Array[Byte]): Mp4Meta = {
    def u32(p: Int): Long = {
      if (p < 0 || p + 4 > b.length) fail()
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Int): String = {
      if (p + 4 > b.length) fail()
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }

    val st = new State

    def walk(from: Int, to: Int, topLevel: Boolean): Unit = {
      var p = from
      while (p < to) {
        if (p + 8 > to) fail()
        var size = u32(p)
        var header = 8
        if (size == 1L) { size = u64(p + 8); header = 16 }
        else if (size == 0L) {
          if (!topLevel) fail() // to-end-of-file only legal at top level
          size = (to - p).toLong
        }
        if (size < header || p + size > to) fail()
        val typ = fourcc(p + 4)
        val body = p + header
        val bodyEnd = (p + size).toInt
        // leaf-box field reads must stay inside the box's OWN body — a
        // truncated leaf whose fields would overrun into a sibling box
        // is malformed, not a source of garbage Some(...)
        def need(bytes: Int): Unit = if (body + bytes > bodyEnd) fail()
        typ match {
          case "ftyp" =>
            need(4)
            if (st.brand == null) st.brand = fourcc(body)
          case "mvhd" =>
            need(1)
            val version = b(body) & 0xff
            if (version == 1) {
              need(32) // v1: ver/flags 4 + times 8+8 + timescale 4 + duration 8
              st.timescale = u32(body + 20)
              st.duration = u64(body + 24)
            } else {
              need(20) // v0: ver/flags 4 + times 4+4 + timescale 4 + duration 4
              st.timescale = u32(body + 12)
              st.duration = u32(body + 16)
            }
          case "hdlr" =>
            need(12) // ver/flags 4 + pre_defined 4 + handler_type 4
            st.handlers += fourcc(body + 8)
          case "stsd" =>
            need(8) // ver/flags 4 + entry_count 4
            val entries = u32(body + 4)
            var q = body + 8
            var e = 0L
            while (e < entries) {
              if (q + 8 > bodyEnd) fail() // entry header inside stsd body
              val esize = u32(q)
              if (esize < 8 || q + esize > bodyEnd) fail()
              st.codecs += fourcc(q + 4)
              q += esize.toInt
              e += 1
            }
          case "trak" =>
            st.tracks += 1
            walk(body, bodyEnd, topLevel = false)
          case c if Containers.contains(c) =>
            walk(body, bodyEnd, topLevel = false)
          case _ => () // leaf we don't need (mdat, free, udta, ...)
        }
        p = bodyEnd
      }
    }

    walk(0, b.length, topLevel = true)
    if (st.timescale <= 0 || st.duration < 0) fail() // no moov/mvhd → not a movie
    Mp4Meta(
      if (st.brand == null) "" else st.brand,
      st.timescale, st.duration,
      st.duration * 1000L / st.timescale,
      st.tracks, st.handlers.sorted.toSeq, st.codecs.sorted.toSeq)
  }
}
