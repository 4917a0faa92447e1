package graft.operators

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8, UTF_16BE, UTF_16LE}

/**
 * Charset-aware page decode — the step between WARC ingest
 * ([[graft.sources.WarcCodec]] hands over the page BYTES plus the raw
 * HTTP `Content-Type` header) and [[HtmlExtract]] (which wants a
 * STRING). Real crawls are ~10–20% legacy-charset (Latin-1,
 * Windows-125x, Shift-JIS); decoding everything as UTF-8 silently
 * mangles exactly the documents a multilingual corpus is collected
 * for, so a C4/CCNet-style pipeline sniffs before it decodes.
 *
 * Sniffing order follows the WHATWG encoding standard's precedence
 * (the behavior every browser implements, so it is what crawled HTML
 * is authored against):
 *  1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — certain,
 *     overrides even a lying `<meta>`;
 *  2. transport layer: the `charset=` parameter of the HTTP
 *     `Content-Type` header;
 *  3. in-band prescan of the first [[PrescanBytes]] bytes for
 *     `<meta charset="…">` or
 *     `<meta http-equiv="content-type" content="…; charset=…">`
 *     (the prescan window mirrors browsers' 1024-byte rule);
 *  4. fallback ISO-8859-1 — total (every byte sequence decodes) and
 *     the classic HTTP default, so no page is ever dropped for its
 *     encoding alone.
 *
 * A declared label that the JVM does not recognize falls through to
 * the next source rather than failing the page; malformed byte
 * sequences under the chosen charset decode to U+FFFD (the JDK
 * `new String(bytes, charset)` REPLACE behavior) — the whole path is
 * total, never throws, scan-local.
 */
object CharsetSniff {

  /** Browsers prescan at most this many bytes for a `<meta>` charset. */
  val PrescanBytes = 1024

  /** Decoded page + provenance: `charset` is the canonical JVM name
    * actually used; `source` is one of `bom` / `http` / `meta` /
    * `fallback` — corpus-quality dashboards slice on it. */
  final case class Decoded(text: String, charset: String, source: String)

  /** Resolve a declared charset label; None when the JVM has no such
    * codec (an unknown label falls through to the next sniff source). */
  def resolve(label: String): Option[Charset] = {
    val t = if (label == null) "" else label.trim
    if (t.isEmpty) None
    else try Some(Charset.forName(t))
    catch { case _: IllegalArgumentException | _: UnsupportedOperationException => None }
  }

  /** The `charset=` parameter of a `Content-Type` header value
    * (RFC 9110 §8.3): case-insensitive key, optional quotes. */
  def fromContentType(contentType: String): Option[String] = {
    if (contentType == null) return None
    val lower = contentType.toLowerCase
    val i = lower.indexOf("charset")
    if (i < 0) return None
    var p = i + "charset".length
    val n = contentType.length
    while (p < n && contentType.charAt(p) == ' ') p += 1
    if (p >= n || contentType.charAt(p) != '=') return None
    p += 1
    while (p < n && (contentType.charAt(p) == ' ' || contentType.charAt(p) == '"' ||
      contentType.charAt(p) == '\'')) p += 1
    var e = p
    while (e < n && {
        val c = contentType.charAt(e)
        c != ';' && c != ' ' && c != '"' && c != '\''
      }) e += 1
    if (e > p) Some(contentType.substring(p, e)) else None
  }

  private val MetaCharset =
    // one pattern covers both attribute forms: <meta charset=X> and
    // <meta http-equiv=… content="…; charset=X"> — in each, the label
    // follows a `charset` token inside a meta tag
    "(?is)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:-]*)".r

  /** Prescan the first [[PrescanBytes]] bytes for an in-band charset
    * declaration. The window is decoded as Latin-1 for the scan (byte
    * ⇒ char, total) — the declaration itself is ASCII by spec. */
  def fromMeta(body: Array[Byte]): Option[String] = {
    if (body == null || body.length == 0) return None
    val window = new String(body, 0, math.min(body.length, PrescanBytes), ISO_8859_1)
    MetaCharset.findFirstMatchIn(window).map(_.group(1))
  }

  /** (charset, BOM length) when the page leads with a byte-order mark. */
  def fromBom(body: Array[Byte]): Option[(Charset, Int)] = {
    if (body == null) None
    else if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
      (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf) Some((UTF_8, 3))
    else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
      (body(1) & 0xff) == 0xfe) Some((UTF_16LE, 2))
    else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
      (body(1) & 0xff) == 0xff) Some((UTF_16BE, 2))
    else None
  }

  /** Sniff + decode one page. Total: any bytes in, some text out. */
  def decode(body: Array[Byte], httpContentType: String): Decoded = {
    if (body == null) return Decoded("", ISO_8859_1.name, "fallback")
    fromBom(body) match {
      case Some((cs, skip)) =>
        Decoded(new String(body, skip, body.length - skip, cs), cs.name, "bom")
      case None =>
        fromContentType(httpContentType).flatMap(resolve) match {
          case Some(cs) => Decoded(new String(body, cs), cs.name, "http")
          case None =>
            fromMeta(body).flatMap(resolve) match {
              case Some(cs) => Decoded(new String(body, cs), cs.name, "meta")
              case None =>
                Decoded(new String(body, ISO_8859_1), ISO_8859_1.name, "fallback")
            }
        }
    }
  }
}
