package graft.operators

/**
 * Punycode (RFC 3492) — the bootstring encoding behind IDNA's
 * `xn--` host labels. Crawled URLs carry internationalized hostnames
 * both ways (Unicode in hrefs, `xn--` on the wire); canonicalizing to
 * the ASCII form ([[UrlOps.normalize]]) is what lets per-domain
 * grouping and URL dedup see `münchen.de` and `xn--mnchen-3ya.de` as
 * the same registrable domain, the way browsers and crawlers do.
 *
 * Direct implementation of RFC 3492 §6.2/§6.3 with the base-36
 * parameters of §5; arithmetic in Long with the spec's overflow
 * checks — None on overflow or (for decode) malformed input, never a
 * throw. Validated in the spec against the JDK's independent
 * `java.net.IDN` implementation.
 */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128
  private val MaxCp = 0x10FFFFL

  private def adapt(delta0: Long, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    (k + (((Base - TMin + 1) * delta) / (delta + Skew))).toInt
  }

  private def digitChar(d: Long): Char =
    if (d < 26) ('a' + d).toChar else ('0' + (d - 26)).toChar

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Encode one Unicode label to its punycode form (WITHOUT the
    * `xn--` prefix). None on overflow — unreachable for any label
    * within DNS length limits. */
  def encode(label: String): Option[String] = {
    val cps = label.codePoints().toArray
    val sb = new StringBuilder
    cps.foreach(c => if (c < InitialN) sb.append(c.toChar))
    val b = sb.length
    var h = b
    if (b > 0 && h < cps.length) sb.append('-')
    var n = InitialN.toLong
    var delta = 0L
    var bias = InitialBias
    while (h < cps.length) {
      var m = MaxCp + 1
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m - n) * (h + 1)
      if (delta > Int.MaxValue) return None // overflow (spec §6.4)
      n = m
      var i = 0
      while (i < cps.length) {
        val c = cps(i)
        if (c < n) {
          delta += 1
          if (delta > Int.MaxValue) return None
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              sb.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          sb.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    Some(sb.toString)
  }

  /** Decode a punycode label (WITHOUT the `xn--` prefix). None on
    * malformed digits or overflow. */
  def decode(label: String): Option[String] = {
    val d = label.lastIndexOf('-')
    val output = new java.lang.StringBuilder
    val basicEnd = if (d > 0) d else 0
    var i = 0
    while (i < basicEnd) {
      val c = label.charAt(i)
      if (c >= 128) return None
      output.append(c)
      i += 1
    }
    var inPos = if (d > 0) d + 1 else 0
    var n = InitialN.toLong
    var insert = 0L
    var bias = InitialBias
    val cps = scala.collection.mutable.ArrayBuffer.empty[Int]
    output.toString.foreach(cps += _.toInt)
    while (inPos < label.length) {
      val oldInsert = insert
      var w = 1L
      var k = Base
      var done = false
      while (!done) {
        if (inPos >= label.length) return None // truncated
        val digit = digitValue(label.charAt(inPos))
        inPos += 1
        if (digit < 0) return None
        insert += digit * w
        if (insert > Int.MaxValue) return None
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          w *= Base - t
          if (w > Int.MaxValue) return None
          k += Base
        }
      }
      bias = adapt(insert - oldInsert, cps.length + 1, oldInsert == 0)
      n += insert / (cps.length + 1)
      if (n > MaxCp) return None
      insert = insert % (cps.length + 1)
      if (!Character.isValidCodePoint(n.toInt)) return None
      cps.insert(insert.toInt, n.toInt)
      insert += 1
    }
    val sb = new java.lang.StringBuilder
    cps.foreach(sb.appendCodePoint)
    Some(sb.toString)
  }

  /** IDNA host → ASCII: each non-ASCII label becomes `xn--` +
    * punycode (labels expected pre-lowercased, as
    * [[UrlOps.normalize]] does); ASCII labels pass through. None when
    * any label overflows. */
  def hostToAscii(host: String): Option[String] = {
    val labels = host.split('.')
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.forall(_ < 128)) out(i) = l
      else encode(l) match {
        case Some(p) => out(i) = "xn--" + p
        case None    => return None
      }
      i += 1
    }
    Some(out.mkString("."))
  }
}
