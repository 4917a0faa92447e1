package graft.operators

import scala.collection.mutable.ArrayBuffer

/**
 * URL parsing and canonicalization — crawl-curation primitives next
 * to [[HtmlExtract]]: per-domain corpus stats, URL-level dedup keys,
 * and link-graph edges all start from a NORMALIZED url. Pure Scala,
 * scan-local, total (None on malformed — a crawl's URL column is
 * hostile). Deliberately not `java.net.URL` (whose equals/hashCode
 * resolve DNS) and not `java.net.URI` (throws on half the crawl).
 *
 * Normalization follows RFC 3986 §6 plus the crawl-standard extras:
 *  - scheme and host lowercased; userinfo and fragment dropped;
 *  - default ports stripped (http:80, https:443), others kept;
 *  - percent-encodings of UNRESERVED chars decoded (`%41` → `A`),
 *    all other escapes kept with uppercase hex (`%2f` → `%2F`);
 *  - dot-segments removed (`/a/./b/../c` → `/a/c`), empty path → `/`;
 *  - tracking params dropped (`utm_*`, fbclid, gclid, msclkid, ref),
 *    remaining query params sorted by (key, value) for a stable
 *    dedup key; empty query drops the `?`.
 */
object UrlOps {

  /** `port` = -1 when absent; `query`/`fragment` empty when absent. */
  final case class ParsedUrl(
      scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** Click-tracking params safe to strip globally. Bare `ref` is NOT
    * here: on some sites (`?ref=docs`) it selects content, so dropping
    * it would merge distinct pages — only the `utm_*` family and the
    * ad-network click ids are universally safe. */
  private val TrackingParams =
    Set("fbclid", "gclid", "msclkid", "ref_src", "igshid")

  private def parsePort(ps: String): Option[Int] =
    if (ps.isEmpty || ps.length > 5 || !ps.forall(Character.isDigit)) None
    else Some(ps.toInt).filter(_ <= 65535)

  def parse(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val ss = url.indexOf("://")
    if (ss <= 0) return None
    val scheme = url.substring(0, ss)
    if (!scheme.forall(c => Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.')
        || !Character.isLetter(scheme.charAt(0))) return None
    var p = ss + 3
    val n = url.length
    // authority: up to the first '/', '?' or '#'
    var ae = p
    while (ae < n && url.charAt(ae) != '/' && url.charAt(ae) != '?' &&
        url.charAt(ae) != '#') ae += 1
    var auth = url.substring(p, ae)
    val at = auth.lastIndexOf('@') // userinfo dropped
    if (at >= 0) auth = auth.substring(at + 1)
    // RFC 3986 §3.2.2 IP-literal: `[::1]` / `[::1]:8080` — the colons
    // inside the brackets are NOT a port separator.
    val (host, port) =
      if (auth.startsWith("[")) {
        val close = auth.indexOf(']')
        if (close < 0) return None
        val h = auth.substring(0, close + 1)
        val rest = auth.substring(close + 1)
        if (rest.isEmpty) (h, -1)
        else if (rest.charAt(0) != ':') return None
        else parsePort(rest.substring(1)) match {
          case Some(pv) => (h, pv)
          case None     => return None
        }
      } else {
        val colon = auth.lastIndexOf(':')
        if (colon < 0) (auth, -1)
        else parsePort(auth.substring(colon + 1)) match {
          case Some(pv) => (auth.substring(0, colon), pv)
          case None     => return None
        }
      }
    if (host.isEmpty || host == "[]") return None
    p = ae
    var pe = p
    while (pe < n && url.charAt(pe) != '?' && url.charAt(pe) != '#') pe += 1
    val path = url.substring(p, pe)
    p = pe
    var qe = p
    if (p < n && url.charAt(p) == '?') {
      qe = p + 1
      while (qe < n && url.charAt(qe) != '#') qe += 1
    }
    val query = if (p < n && url.charAt(p) == '?') url.substring(p + 1, qe) else ""
    val fragment = if (qe < n && url.charAt(qe) == '#') url.substring(qe + 1) else ""
    Some(ParsedUrl(scheme, host, port, path, query, fragment))
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode `%XX` of unreserved chars, uppercase the hex of the rest;
    * malformed escapes pass through literally (totality). */
  def normalizePercent(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = (Character.digit(s.charAt(i + 1), 16) << 4) |
          Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4; `/a/b/..` keeps its directory slash (`/a/`). */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return "/"
    val out = ArrayBuffer.empty[String]
    path.split("/", -1).foreach {
      case "" | "." => ()
      case ".."     => if (out.nonEmpty) out.remove(out.length - 1)
      case seg      => out += seg
    }
    val trail = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    if (out.isEmpty) "/"
    else "/" + out.mkString("/") + (if (trail) "/" else "")
  }

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

  /** Strip tracking params, sort the rest by (key, value). */
  def normalizeQuery(query: String): String =
    if (query.isEmpty) ""
    else query.split("&", -1).toSeq
      .filter(_.nonEmpty)
      .map { kv => // (key, value, verbatim) — verbatim keeps `k` vs `k=`
        val eq = kv.indexOf('=')
        if (eq < 0) (kv, "", kv)
        else (kv.substring(0, eq), kv.substring(eq + 1), kv)
      }
      .filterNot { case (k, _, _) => isTracking(k.toLowerCase) }
      .sortBy { case (k, v, _) => (k, v) }
      .map(_._3)
      .mkString("&")

  /** `^scheme:` prefix test — the RFC 3986 §4.2 absolute/relative
    * discriminator (also catches `mailto:`/`javascript:` pseudo-links,
    * which then fail [[parse]]'s `://` requirement and drop out). */
  private def hasScheme(ref: String): Boolean = {
    if (ref.isEmpty || !Character.isLetter(ref.charAt(0))) return false
    var i = 1
    while (i < ref.length && {
        val c = ref.charAt(i)
        Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'
      }) i += 1
    i < ref.length && ref.charAt(i) == ':'
  }

  /**
   * RFC 3986 §5.2 reference resolution — hrefs scraped from a page
   * ([[HtmlExtract.Extracted.links]]) become absolute URLs against the
   * page URL, the step between link extraction and the link graph.
   * Handles every reference form a crawl meets: absolute (returned
   * as-is), protocol-relative (`//host/…`), absolute-path, relative
   * path (merged with the base directory, dot-segments removed),
   * query-only (`?…`), fragment-only (`#…`), and empty. None when the
   * BASE itself does not parse (hostile crawl URLs).
   */
  def resolve(base: String, ref: String): Option[String] = {
    if (ref == null) return None
    val r = ref.trim
    if (hasScheme(r)) return Some(r)
    parse(base).map { b =>
      val prefix = b.scheme + "://" + b.host +
        (if (b.port >= 0) ":" + b.port else "")
      val basePath = if (b.path.isEmpty) "/" else b.path
      if (r.startsWith("//")) b.scheme + ":" + r
      else if (r.startsWith("/")) prefix + r
      else if (r.startsWith("?")) prefix + basePath + r
      else if (r.startsWith("#"))
        prefix + basePath + (if (b.query.nonEmpty) "?" + b.query else "") + r
      else if (r.isEmpty)
        prefix + basePath + (if (b.query.nonEmpty) "?" + b.query else "")
      else {
        // §5.2.3 merge: base directory (up to the last '/') + ref's
        // path part; ref's own query/fragment ride along untouched
        val cut = r.indexWhere(c => c == '?' || c == '#')
        val (rPath, rRest) =
          if (cut < 0) (r, "") else (r.substring(0, cut), r.substring(cut))
        val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
        prefix + removeDotSegments(dir + rPath) + rRest
      }
    }
  }

  /** Lowercased host in its IDNA ASCII form: non-ASCII labels become
    * `xn--` punycode (RFC 3492), so `MÜNCHEN.de`, `münchen.de`, and
    * `xn--mnchen-3ya.de` all canonicalize to the last — one dedup/
    * grouping key per registrable name, the way crawlers see hosts on
    * the wire. Punycode overflow (impossible within DNS label limits)
    * keeps the Unicode form rather than dropping the URL. */
  private def asciiHost(raw: String): String = {
    val h = raw.toLowerCase.stripSuffix(".")
    if (h.forall(_ < 128)) h
    else Punycode.hostToAscii(h).getOrElse(h)
  }

  def normalize(url: String): Option[String] = parse(url).map { u =>
    val scheme = u.scheme.toLowerCase
    val host = asciiHost(u.host)
    val portPart =
      if (u.port < 0 || DefaultPorts.get(scheme).contains(u.port)) ""
      else ":" + u.port
    val path = removeDotSegments(normalizePercent(u.path))
    val q = normalizeQuery(normalizePercent(u.query))
    scheme + "://" + host + portPart + path + (if (q.isEmpty) "" else "?" + q)
  }

  /** `www.blog.site3.co.uk` → `site3.co.uk` — the registrable domain
    * under the full [[PublicSuffix]] rule walk (longest match,
    * wildcard and exception rules, implicit `*` default for unknown
    * TLDs); single-label hosts and IP literals pass through. */
  def registeredDomain(host: String): String = {
    if (host == null) return ""
    PublicSuffix.registeredDomain(asciiHost(host))
  }
}
