package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** CSV sniffing: dialect recovery across delimiters, the quote-aware
  * counting the naive sniffer gets wrong, header heuristics, RFC 4180
  * splitting, totality. */
class CsvSniffSpec extends AnyFunSuite {
  import CsvSniff._

  test("plain dialects: delimiter, column count, header") {
    val semi = "name;age;city\nbob;31;nyc\neve;44;sfo"
    assert(sniff(semi) === Some(CsvDialect(";", quoted = false,
      header = true, nCols = 3)))
    val tab = "a\tb\nc\td\ne\tf"
    val t = sniff(tab).get
    assert(t.delimiter === "\t" && t.nCols === 2 && !t.header)
  }

  test("quoted delimiter inside a field does not fool the count") {
    // naive raw counting sees 3 commas on data rows but 2 on the
    // header -> inconsistent; quote-aware counting sees 2 everywhere
    val csv = "name,quote,n\n\"doe, jane\",\"hi\",1\n\"roe, ron\",\"yo\",2"
    assert(sniff(csv) === Some(CsvDialect(",", quoted = true,
      header = true, nCols = 3)))
  }

  test("header=false when the first row already has numeric fields") {
    val csv = "1,alpha\n2,beta\n3,gamma"
    val d = sniff(csv).get
    assert(d.delimiter === "," && !d.header)
    // all-text files have no numeric evidence either way -> no header
    val allText = "aa,bb\ncc,dd"
    assert(!sniff(allText).get.header)
  }

  test("splitLine: RFC 4180 quotes and the doubled-quote escape") {
    assert(splitLine("\"a,b\",c,\"say \"\"hi\"\"\"", ',') ===
      Seq("a,b", "c", "say \"hi\""))
    assert(splitLine("plain|x||", '|') === Seq("plain", "x", "", ""))
  }

  test("totality: null, empty, one line, no delimiter at all") {
    assert(sniff(null) === None)
    assert(sniff("") === None)
    assert(sniff("only one line, no newline") === None)
    assert(sniff("word\nanother\nthird") === None) // no candidate appears
  }

  test("pipe wins over comma when pipe is consistent and comma is noise") {
    val csv = "a|b,c|d\ne|f|g\nh|i|j"
    val d = sniff(csv).get
    assert(d.delimiter === "|" && d.nCols === 3)
  }
}
