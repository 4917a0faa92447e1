package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/**
 * AVIF container census — the newest member of the web image family
 * (JPEG, PNG, GIF, BMP, WEBP, TIFF all have census/decode paths in
 * this package). AVIF is ISO-BMFF like MP4 ([[Mp4Parser]]), but the
 * image properties live under a different subtree, and `meta` is a
 * FULL box (4 bytes of version/flags before its children — walking it
 * as a plain container desyncs the stream, which is exactly the bug
 * this dedicated walker avoids):
 *
 *   ftyp(brand avif) → meta[full] → iprp → ipco → ispe[full]
 *   (u32 width, u32 height), plus sibling properties (pixi, av1C, …).
 *
 * The census recovers brand, dimensions, and the property count from
 * box headers alone — payload (the AV1 OBUs in mdat) never touched.
 * Total: malformed/truncated → None.
 */
object AvifParser {

  final case class AvifMeta(
      brand: String, width: Long, height: Long, n_props: Int)

  // ------------------------------------------------------------- builder

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def cc(s: String): Array[Byte] = s.getBytes(US_ASCII)

  private def box(t: String, body: Array[Byte]): Array[Byte] =
    u32(body.length + 8L) ++ cc(t) ++ body

  private def fullBox(t: String, body: Array[Byte]): Array[Byte] =
    box(t, u32(0L) ++ body) // version 0, flags 0

  /** Minimal valid AVIF: ftyp, meta(hdlr, iprp(ipco(ispe [, pixi]))),
    * and an empty mdat. */
  def buildAvif(
      width: Long, height: Long, withPixi: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 0xffffffffL &&
      height >= 1 && height <= 0xffffffffL)
    val hdlr = fullBox("hdlr",
      u32(0) ++ cc("pict") ++ u32(0) ++ u32(0) ++ u32(0) ++ Array[Byte](0))
    val ispe = fullBox("ispe", u32(width) ++ u32(height))
    val pixi = fullBox("pixi", Array[Byte](3, 8, 8, 8)) // 3 channels × 8 bit
    val ipco = box("ipco", if (withPixi) ispe ++ pixi else ispe)
    val meta = fullBox("meta", hdlr ++ box("iprp", ipco))
    box("ftyp", cc("avif") ++ u32(0) ++ cc("avifmif1")) ++ meta ++
      box("mdat", Array.emptyByteArray)
  }

  // -------------------------------------------------------------- parser

  private def readU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** Census an AVIF file. None unless a well-formed ftyp with an avif
    * brand AND a meta→iprp→ipco→ispe chain is present. */
  def parseAvif(bytes: Array[Byte]): Option[AvifMeta] = {
    if (bytes == null || bytes.length < 16) return None
    var brand: Option[String] = None
    var dims: Option[(Long, Long)] = None
    var nProps = 0

    // walk a plain container [from, until); fullBoxSkip: bytes of
    // version/flags to skip inside a FULL container box (meta)
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      if (depth > 8) return false
      var p = from
      while (p < until) {
        if (p + 8 > until) return false
        val size = readU32(bytes, p)
        if (size < 8) return false // size==0/1 (to-eof / 64-bit) out of scope for images
        val typ = new String(bytes, p + 4, 4, US_ASCII)
        val body = p + 8
        val end = p + size
        if (end > until) return false
        typ match {
          case "ftyp" =>
            if (size < 16) return false
            brand = Some(new String(bytes, body, 4, US_ASCII))
          case "meta" => // FULL box: 4-byte version/flags then children
            if (size < 12) return false
            if (!walk(body + 4, end.toInt, depth + 1)) return false
          case "iprp" =>
            if (!walk(body, end.toInt, depth + 1)) return false
          case "ipco" =>
            // children are the properties; count and scan for ispe
            var q = body
            while (q < end) {
              if (q + 8 > end) return false
              val psz = readU32(bytes, q)
              if (psz < 8 || q + psz > end) return false
              nProps += 1
              if (new String(bytes, q + 4, 4, US_ASCII) == "ispe") {
                if (psz < 20) return false
                dims = Some((readU32(bytes, q + 12), readU32(bytes, q + 16)))
              }
              q += psz.toInt
            }
          case _ => () // hdlr, mdat, unknown: skip by size
        }
        p = end.toInt
      }
      true
    }

    if (!walk(0, bytes.length, 0)) return None
    for {
      b <- brand if b == "avif" || b == "avis"
      (w, h) <- dims
    } yield AvifMeta(b, w, h, nProps)
  }
}
