package graft.operators

/**
 * Public-suffix rules and the full publicsuffix.org matching
 * algorithm — the substrate of [[UrlOps.registeredDomain]], the key
 * every per-domain crawl stat and link-graph edge groups on. The
 * ALGORITHM is complete (longest-rule-wins over arbitrary label
 * depth, `*.` wildcard rules, `!` exception rules, implicit `*`
 * default); the RULE SET is a generated snapshot subset of the
 * Mozilla Public Suffix List — the registry-policy families that
 * carry the overwhelming mass of crawled hosts (the full ~9k-entry
 * list drops into these three sets unchanged, entry for entry).
 *
 * Spec (publicsuffix.org/list/): a rule matches when its labels equal
 * the host's trailing labels (`*` matches exactly one label); among
 * matches an exception rule prevails, else the most-labeled rule; the
 * public suffix is the matched rule (minus the leading label for an
 * exception), and the registered (or "registrable") domain is the
 * public suffix plus one more label.
 */
object PublicSuffix {

  /** Exact rules: each entry IS a public suffix. */
  val Rules: Set[String] = {
    val b = Set.newBuilder[String]
    // ICANN section — ccTLD second-level registries, by family
    def family(tld: String, labels: String*): Unit =
      labels.foreach(l => b += s"$l.$tld")
    family("uk", "co", "org", "me", "ac", "gov", "net", "sch", "nhs",
      "police", "ltd", "plc")
    family("au", "com", "net", "org", "edu", "gov", "asn", "id")
    family("nz", "co", "net", "org", "govt", "ac", "school", "geek", "gen",
      "kiwi", "maori", "iwi", "health", "mil", "parliament", "cri")
    family("sg", "com", "net", "org", "gov", "edu", "per")
    family("jp", "co", "ne", "or", "ac", "ad", "ed", "go", "gr", "lg")
    family("in", "co", "net", "org", "firm", "gen", "ind", "ac", "edu",
      "res", "gov", "mil", "nic")
    family("br", "com", "net", "org", "gov", "edu", "mil", "art", "adv",
      "arq", "bio", "blog", "eco", "emp", "eng", "esp", "ind", "inf",
      "jus", "leg", "med", "mus", "psi", "rec", "srv", "tur", "tv", "vet",
      "wiki")
    family("cn", "com", "net", "org", "gov", "edu", "ac", "mil")
    family("kr", "co", "ne", "or", "re", "pe", "go", "mil", "ac", "hs",
      "ms", "es", "sc", "kg", "seoul", "busan", "incheon")
    family("za", "co", "net", "org", "gov", "edu", "ac", "web", "nom", "mil")
    family("mx", "com", "net", "org", "gob", "edu")
    family("ar", "com", "net", "org", "gob", "gov", "edu", "int", "mil", "tur")
    family("tr", "com", "net", "org", "gov", "edu", "k12", "av", "bel",
      "biz", "dr", "gen", "info", "mil", "name", "tel", "web")
    family("tw", "com", "net", "org", "edu", "gov", "idv", "game", "club", "ebiz")
    family("hk", "com", "net", "org", "edu", "gov", "idv")
    family("my", "com", "net", "org", "gov", "edu", "mil", "name")
    family("id", "co", "net", "or", "web", "sch", "ac", "go", "mil", "my",
      "biz", "desa", "ponpes")
    family("th", "co", "net", "or", "ac", "go", "in", "mi")
    family("ph", "com", "net", "org", "gov", "edu", "ngo", "mil", "i")
    family("vn", "com", "net", "org", "edu", "gov", "int", "ac", "biz",
      "info", "name", "pro", "health")
    family("il", "co", "net", "org", "ac", "gov", "muni", "k12", "idf")
    family("ru", "ac", "edu", "gov", "int", "mil", "test", "com", "net", "org")
    family("ua", "com", "net", "org", "edu", "gov", "in")
    family("pl", "com", "net", "org", "edu", "gov", "info", "biz", "waw",
      "mil", "nom", "sklep")
    family("eg", "com", "net", "org", "edu", "gov", "sci", "eun", "mil", "name")
    family("sa", "com", "net", "org", "edu", "gov", "med", "sch", "pub")
    family("ae", "co", "net", "org", "ac", "gov", "mil", "sch")
    family("qa", "com", "net", "org", "edu", "gov", "mil", "name", "sch")
    family("kw", "com", "net", "org", "edu", "gov", "ind", "emb")
    family("ke", "co", "or", "ne", "go", "info", "me", "mobi", "sc", "ac")
    family("ng", "com", "edu", "gov", "net", "org", "name", "sch", "i", "mil", "mobi")
    family("gh", "com", "edu", "gov", "org", "mil")
    family("tz", "co", "ac", "go", "or", "ne", "mil", "sc", "hotel", "info",
      "me", "mobi", "tv")
    family("ug", "co", "ac", "or", "go", "ne", "sc", "org", "com")
    family("zm", "co", "ac", "org", "gov", "mil", "net", "sch", "biz", "info")
    family("zw", "co", "ac", "gov", "org", "mil")
    family("na", "com", "co", "org", "net", "alt", "edu", "info", "mobi")
    family("bw", "co", "org", "ac", "gov", "net")
    family("co", "com", "edu", "gov", "net", "org", "nom", "mil")
    family("pe", "com", "edu", "gob", "net", "org", "nom", "mil")
    family("cl", "gob", "gov", "co", "mil")
    family("ve", "com", "edu", "gob", "net", "org", "mil", "web", "co", "info")
    family("ec", "com", "net", "org", "edu", "gob", "gov", "info", "fin",
      "med", "mil", "pro", "k12")
    family("uy", "com", "edu", "gub", "net", "org", "mil")
    family("py", "com", "edu", "gov", "net", "org", "mil", "coop")
    family("bo", "com", "edu", "gob", "net", "org", "mil", "int", "tv", "web")
    family("cr", "co", "fi", "go", "or", "sa", "ac", "ed")
    family("gt", "com", "edu", "gob", "net", "org", "mil", "ind")
    family("sv", "com", "edu", "gob", "org", "red")
    family("hn", "com", "edu", "gob", "net", "org", "mil")
    family("ni", "com", "edu", "gob", "net", "org", "int", "ac", "biz", "info")
    family("pa", "com", "edu", "gob", "net", "org", "ac", "sld", "abo",
      "ing", "med", "nom")
    family("do", "com", "edu", "gob", "gov", "net", "org", "mil", "sld",
      "web", "art")
    family("cu", "com", "edu", "gov", "net", "org", "inf")
    family("es", "com", "nom", "org", "gob", "edu")
    family("it", "gov", "edu")
    family("fr", "asso", "com", "gouv", "nom", "prd", "tm")
    family("pt", "com", "edu", "gov", "int", "net", "nome", "org", "publ")
    family("gr", "com", "edu", "net", "org", "gov")
    family("ro", "com", "org", "tm", "nt", "nom", "info", "rec", "arts",
      "firm", "store", "www")
    family("hu", "co", "org", "info", "priv", "sport", "tm", "2000",
      "agrar", "bolt", "city", "film", "forum", "games", "hotel", "lakas",
      "media", "news", "sex", "shop", "suli", "szex", "tozsde", "utazas", "video")
    family("at", "ac", "co", "gv", "or")
    family("se", "org", "pp", "tm", "parti", "press", "komforb")
    family("rs", "co", "org", "edu", "in", "gov", "ac")
    family("hr", "com", "iz", "from", "name")
    family("ee", "edu", "gov", "riik", "lib", "med", "com", "fie", "aip",
      "org", "pri")
    family("lv", "com", "edu", "gov", "org", "mil", "id", "net", "asn", "conf")
    family("lt", "gov")
    family("ca", "gc", "ab", "bc", "mb", "nb", "nf", "nl", "ns", "nt",
      "nu", "on", "pe", "qc", "sk", "yk")
    family("us", "dni", "fed", "isa", "kids", "nsn", "dc",
      "al", "ak", "az", "ar", "ca", "co", "ct", "de", "fl", "ga", "hi",
      "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me", "mi",
      "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm", "nv",
      "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut",
      "va", "vt", "wa", "wi", "wv", "wy")
    // private section — the hosting platforms that dominate crawl mass
    b += "github.io"; b += "gitlab.io"; b += "blogspot.com"
    b += "herokuapp.com"; b += "netlify.app"; b += "vercel.app"
    b += "firebaseapp.com"; b += "web.app"; b += "appspot.com"
    b += "azurewebsites.net"; b += "cloudfront.net"; b += "wordpress.com"
    b += "pages.dev"; b += "workers.dev"; b += "glitch.me"; b += "repl.co"
    // multi-label private rules (the algorithm walks every depth)
    b += "s3.amazonaws.com"; b += "compute.amazonaws.com"
    b += "elb.amazonaws.com"
    b.result()
  }

  /** Wildcard rules `*.tld`: EVERY second-level label under these is a
    * public suffix (stored by parent; `*` matches exactly one label). */
  val Wildcards: Set[String] =
    Set("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg")

  /** Exception rules `!host`: carve-outs from a wildcard — the entry
    * itself is REGISTRABLE (its public suffix is one label shorter). */
  val Exceptions: Set[String] = Set("www.ck")

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
