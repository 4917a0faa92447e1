package graft.sources

/**
 * CSV dialect sniffing — the ingestion gate for the tabular half of a
 * corpus drop: real-world "CSV" arrives comma-, semicolon-, tab- and
 * pipe-delimited, quoted or not, with or without a header, and a
 * 100 TB loader cannot ask a human per file. The sniffer reads a
 * bounded SAMPLE (first ≤32 lines) and scores each candidate
 * delimiter by per-line count CONSISTENCY — the real delimiter
 * appears the same number of times on every record (the field
 * count), while an accidental character does not. Quote-aware: a
 * delimiter inside a quoted field does not count (the classic
 * sniffing mistake), and `""` is the RFC 4180 escape.
 *
 * Header detection is the standard two-row heuristic: the first row
 * is a header when none of its fields are numeric while some later
 * row has numeric fields (column NAMES are words; data often isn't).
 *
 * Deterministic by construction — fixed candidate order, integer
 * scores, total tie-breaks — so a distributed census over millions of
 * files is reproducible, and a SQL oracle can pin expected dialects.
 */
object CsvSniff {

  final case class CsvDialect(
      delimiter: String, quoted: Boolean, header: Boolean, nCols: Int)

  val Candidates: Seq[Char] = Seq(',', ';', '\t', '|')

  /** Human-readable delimiter name (stable census key — keeps tab
    * characters out of report tables). */
  def delimiterName(d: String): String = d match {
    case "," => "comma"
    case ";" => "semicolon"
    case "\t" => "tab"
    case "|" => "pipe"
    case other => other
  }

  private def countOutsideQuotes(line: String, d: Char): Int = {
    var n = 0
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == d && !inQ) n += 1
      i += 1
    }
    n
  }

  /** RFC 4180 field split: quotes toggle, `""` inside quotes is a
    * literal quote, delimiters inside quotes are data. */
  def splitLine(line: String, d: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') {
        if (inQ && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else inQ = !inQ
      } else if (c == d && !inQ) {
        out += cur.toString; cur.setLength(0)
      } else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result()
  }

  private def numeric(s: String): Boolean = {
    val t = s.trim
    t.nonEmpty && t.exists(_.isDigit) &&
      t.forall(ch => ch.isDigit || ch == '.' || ch == '-' || ch == '+')
  }

  /** Sniff a sample (needs ≥ 2 non-empty lines and a delimiter that
    * appears at least once per record; None otherwise — the caller
    * routes such files to manual/fallback handling). */
  def sniff(sample: String): Option[CsvDialect] = {
    if (sample == null) return None
    val lines = sample.split("\r?\n").iterator.filter(_.nonEmpty).take(32).toArray
    if (lines.length < 2) return None
    val scored = Candidates.map { d =>
      val counts = lines.map(countOutsideQuotes(_, d))
      // modal count, ties to the larger count (more columns)
      val mode = counts.groupBy(identity).toSeq
        .maxBy { case (v, g) => (g.length, v) }._1
      (d, mode, counts.count(_ == mode))
    }.filter(_._2 >= 1)
    if (scored.isEmpty) return None
    // highest consistency wins; then more columns; then candidate order
    val (d, mode, _) = scored.maxBy { case (dd, m, c) =>
      (c, m, -Candidates.indexOf(dd))
    }
    val quoted = lines.exists(_.indexOf('"') >= 0)
    val head = splitLine(lines.head, d)
    val header = head.nonEmpty && head.forall(f => !numeric(f)) &&
      lines.iterator.drop(1).exists(l => splitLine(l, d).exists(numeric))
    Some(CsvDialect(d.toString, quoted, header, mode + 1))
  }
}
