package graft.operators

/**
 * Public-suffix rules and the full publicsuffix.org matching
 * algorithm — the substrate of [[UrlOps.registeredDomain]], the key
 * every per-domain crawl stat and link-graph edge groups on. Both the
 * ALGORITHM (longest-rule-wins over arbitrary label depth, `*.`
 * wildcard rules, `!` exception rules, implicit `*` default) and the
 * RULE SET are complete: the rules parse at class-load from the full
 * Mozilla Public Suffix List snapshot bundled as a resource
 * (`graft/public_suffix_list.dat`, ~9.5k rules, ICANN + PRIVATE
 * sections; MPL 2.0, via the OS `publicsuffix` package — the same
 * snapshot the JDK ships for cookie scoping).
 *
 * Spec (publicsuffix.org/list/): a rule matches when its labels equal
 * the host's trailing labels (`*` matches exactly one label); among
 * matches an exception rule prevails, else the most-labeled rule; the
 * public suffix is the matched rule (minus the leading label for an
 * exception), and the registered (or "registrable") domain is the
 * public suffix plus one more label.
 *
 * A-label space: hosts reach [[registeredDomain]] already punycoded
 * ([[UrlOps.registeredDomain]] runs IDNA toASCII first), so unicode
 * rules in the list (e.g. `公司.cn`) are ALSO stored in their
 * punycode form via [[Punycode.hostToAscii]] — both `食狮.公司.cn`
 * and `xn--85x722f.xn--55qx5d.cn` group under the same key.
 *
 * Per-JVM cost: one 246 KB resource parse into three hash sets at
 * executor class-load — no task-binary weight (object state is never
 * closure-captured), no per-row work beyond set lookups.
 */
object PublicSuffix {

  /** (exact rules, wildcard parents, exception hosts) parsed from the
    * bundled snapshot. Wildcard rules `*.x.y` store the PARENT `x.y`
    * (`*` matches exactly one label); exception rules `!w.x.y` store
    * `w.x.y` (the entry itself is registrable — its public suffix is
    * one label shorter). */
  private val parsed: (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "missing bundled resource graft/public_suffix_list.dat")
    val rules = Set.newBuilder[String]
    val wilds = Set.newBuilder[String]
    val excs = Set.newBuilder[String]
    // unicode rules are stored in BOTH U-label and A-label form so
    // lookups work whichever form survived upstream normalization
    def addForms(b: scala.collection.mutable.Builder[String, Set[String]],
        rule: String): Unit = {
      b += rule
      if (rule.exists(_ > 0x7f))
        Punycode.hostToAscii(rule).foreach(a => b += a)
    }
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { raw =>
        val line = raw.trim.toLowerCase
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("!")) addForms(excs, line.substring(1))
          else if (line.startsWith("*.")) addForms(wilds, line.substring(2))
          else addForms(rules, line)
        }
      }
    } finally src.close()
    (rules.result(), wilds.result(), excs.result())
  }

  /** Exact rules: each entry IS a public suffix. */
  val Rules: Set[String] = parsed._1

  /** Wildcard rules `*.parent`: EVERY label under `parent` is a
    * public suffix (stored by parent; `*` matches exactly one label). */
  val Wildcards: Set[String] = parsed._2

  /** Exception rules `!host`: carve-outs from a wildcard — the entry
    * itself is REGISTRABLE (its public suffix is one label shorter). */
  val Exceptions: Set[String] = parsed._3

  /** Number of labels in `labels`' public suffix (labels left-to-
    * right, already lowercased). Implicit `*` default: 1. */
  private def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1
    var i = 0
    while (i < n) {
      val nLab = n - i
      val suffix = labels.slice(i, n).mkString(".")
      if (Exceptions.contains(suffix)) return nLab - 1 // exception prevails
      if (nLab > best && Rules.contains(suffix)) best = nLab
      if (nLab > best && i + 1 < n &&
        Wildcards.contains(labels.slice(i + 1, n).mkString("."))) best = nLab
      i += 1
    }
    best
  }

  /** The registrable domain: public suffix + one label. The host
    * itself comes back when it IS a public suffix (or a single label
    * or an IP literal — no registry semantics to apply). */
  def registeredDomain(host: String): String = {
    if (host.isEmpty || host.startsWith("[")) return host // IPv6 literal
    val labels = host.split('.')
    if (labels.length <= 1) return host
    if (labels.forall(l => l.nonEmpty && l.forall(Character.isDigit)))
      return host // IPv4 literal: not a DNS name
    val ps = publicSuffixLabels(labels)
    if (labels.length <= ps) host
    else labels.takeRight(ps + 1).mkString(".")
  }
}
