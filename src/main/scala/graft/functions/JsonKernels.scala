package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass JSON-line structure scanner — the ingest triage for
 * JSONL corpora (the interchange format of LLM training data): which
 * top-level fields exist, what type each carries, and which lines are
 * malformed, WITHOUT materializing a parsed tree per row. One linear
 * scan over the line's UTF-8 bytes; all JSON structural characters
 * are ASCII, and continuation bytes of multi-byte code points are
 * ≥ 0x80, so the byte-wise scan can never mistake string content for
 * structure.
 *
 * Pinned semantics (the DuckDB oracle agrees on all of them):
 *  - a line is VALID iff it is exactly one JSON object, with optional
 *    leading/trailing ASCII whitespace — anything else (scalar/array
 *    top level, trailing garbage, truncation, bad nesting, bad number
 *    grammar) → NULL;
 *  - per top-level key one (key, type) row, in order of appearance,
 *    one row PER OCCURRENCE for duplicate keys;
 *  - type ∈ object | array | string | number | boolean | null, from
 *    the value's leading character after full structural validation;
 *  - strings obey the RFC 8259 grammar: only the eight named escapes
 *    and `\uXXXX` (exactly 4 hex digits) are legal, raw control
 *    bytes 0x00–0x1F inside a string invalidate the line, and `\u`
 *    surrogates must pair (lone high or low surrogates invalidate
 *    the line, as in the oracle's yyjson parser);
 *  - keys are reported as their raw bytes between the quotes (no
 *    escape decoding — census keys are identifiers in practice, and
 *    raw bytes keep the kernel allocation-free on the hot path).
 *
 * Oracle scope (documented divergence): the DuckDB replay resolves
 * keys POST-PARSE via `json_keys` + `json_type(line, '$."k"')`, which
 * (a) collapses duplicate keys to one type (last occurrence wins in
 * its parser, while this kernel reports each occurrence with its own
 * type — strictly more information), and (b) addresses keys through a
 * JSON-path string, which cannot name keys containing quotes, escape
 * sequences, or path metacharacters that this kernel reports as raw
 * bytes. Both cases are outside the oracle contract: the parity gate
 * covers unique identifier-like keys (every key the fixtures and any
 * sane census produce); `JsonFieldTypesSpec` pins the kernel's own
 * behavior on both divergent shapes directly.
 */
object JsonKernels {

  private val TObject = UTF8String.fromString("object")
  private val TArray = UTF8String.fromString("array")
  private val TString = UTF8String.fromString("string")
  private val TNumber = UTF8String.fromString("number")
  private val TBoolean = UTF8String.fromString("boolean")
  private val TNull = UTF8String.fromString("null")

  /** @return array<struct<key string, vtype string>> for a valid
    *         object line, null otherwise (including null input). */
  def jsonFieldTypes(line: UTF8String): ArrayData = {
    if (line == null) return null
    val b = line.getBytes
    val n = b.length
    var i = 0
    val fields = new scala.collection.mutable.ArrayBuffer[InternalRow](8)

    def ws(): Unit = {
      while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    }
    def digit(c: Byte): Boolean = c >= '0' && c <= '9'

    def hex(c: Byte): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    def hexVal(c: Byte): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else c - 'A' + 10

    /** cursor at opening quote; leaves it past the closing quote.
      * Enforces the RFC 8259 string grammar: only the eight named
      * escapes plus \u with exactly 4 hex digits are legal, raw
      * control bytes 0x00–0x1F must be escaped (continuation bytes of
      * multi-byte code points are ≥ 0x80 = negative as JVM bytes, so
      * the control check never fires inside them), and \u surrogates
      * must PAIR: a high surrogate (D800–DBFF) is legal only when
      * immediately followed by an escaped low surrogate (DC00–DFFF),
      * and a lone low surrogate is illegal — RFC 8259 §8.2's
      * well-formedness requirement and what the oracle's parser
      * (yyjson) enforces; accepting lone surrogates was an
      * undocumented oracle divergence (r14 advice). */
    def skipString(): Boolean = {
      i += 1
      while (i < n) {
        val c = b(i)
        if (c == '\\') {
          if (i + 1 >= n) return false
          val e = b(i + 1)
          e match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
            case 'u' =>
              if (i + 5 >= n || !hex(b(i + 2)) || !hex(b(i + 3)) ||
                !hex(b(i + 4)) || !hex(b(i + 5))) return false
              val cp = (hexVal(b(i + 2)) << 12) | (hexVal(b(i + 3)) << 8) |
                (hexVal(b(i + 4)) << 4) | hexVal(b(i + 5))
              if (cp >= 0xDC00 && cp <= 0xDFFF) return false // lone low
              if (cp >= 0xD800 && cp <= 0xDBFF) {
                // high surrogate: require the \uDC00–\uDFFF partner
                if (i + 11 >= n || b(i + 6) != '\\' || b(i + 7) != 'u' ||
                  !hex(b(i + 8)) || !hex(b(i + 9)) ||
                  !hex(b(i + 10)) || !hex(b(i + 11))) return false
                val lo = (hexVal(b(i + 8)) << 12) | (hexVal(b(i + 9)) << 8) |
                  (hexVal(b(i + 10)) << 4) | hexVal(b(i + 11))
                if (lo < 0xDC00 || lo > 0xDFFF) return false
                i += 12
              } else i += 6
            case _ => return false
          }
        }
        else if (c == '"') { i += 1; return true }
        else if (c >= 0 && c < 0x20) return false
        else i += 1
      }
      false
    }

    def skipLiteral(lit: String): Boolean = {
      val m = lit.length
      if (i + m > n) return false
      var k = 0
      while (k < m) {
        if (b(i + k) != lit.charAt(k)) return false
        k += 1
      }
      i += m
      true
    }

    def skipNumber(): Boolean = {
      if (i < n && b(i) == '-') i += 1
      if (i >= n || !digit(b(i))) return false
      if (b(i) == '0') i += 1
      else while (i < n && digit(b(i))) i += 1
      if (i < n && b(i) == '.') {
        i += 1
        if (i >= n || !digit(b(i))) return false
        while (i < n && digit(b(i))) i += 1
      }
      if (i < n && (b(i) == 'e' || b(i) == 'E')) {
        i += 1
        if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
        if (i >= n || !digit(b(i))) return false
        while (i < n && digit(b(i))) i += 1
      }
      true
    }

    /** cursor at a value's first byte (whitespace already skipped). */
    def skipValue(): Boolean = {
      if (i >= n) return false
      b(i) match {
        case '"' => skipString()
        case '{' => skipObject(emit = false)
        case '[' => skipArray()
        case 't' => skipLiteral("true")
        case 'f' => skipLiteral("false")
        case 'n' => skipLiteral("null")
        case c if c == '-' || digit(c) => skipNumber()
        case _ => false
      }
    }

    def skipArray(): Boolean = {
      i += 1 // past '['
      ws()
      if (i < n && b(i) == ']') { i += 1; return true }
      while (true) {
        ws()
        if (!skipValue()) return false
        ws()
        if (i >= n) return false
        if (b(i) == ']') { i += 1; return true }
        if (b(i) != ',') return false
        i += 1
      }
      false
    }

    def typeOf(c: Byte): UTF8String = c match {
      case '"' => TString
      case '{' => TObject
      case '[' => TArray
      case 't' | 'f' => TBoolean
      case 'n' => TNull
      case _ => TNumber
    }

    def skipObject(emit: Boolean): Boolean = {
      i += 1 // past '{'
      ws()
      if (i < n && b(i) == '}') { i += 1; return true }
      while (true) {
        ws()
        if (i >= n || b(i) != '"') return false
        val keyStart = i + 1
        if (!skipString()) return false
        val keyEnd = i - 1
        ws()
        if (i >= n || b(i) != ':') return false
        i += 1
        ws()
        if (i >= n) return false
        if (emit) {
          val key = UTF8String.fromBytes(b, keyStart, keyEnd - keyStart)
          fields += InternalRow(key, typeOf(b(i)))
        }
        if (!skipValue()) return false
        ws()
        if (i >= n) return false
        if (b(i) == '}') { i += 1; return true }
        if (b(i) != ',') return false
        i += 1
      }
      false
    }

    ws()
    if (i >= n || b(i) != '{') return null
    if (!skipObject(emit = true)) return null
    ws()
    if (i != n) return null
    new GenericArrayData(fields.toArray[Any])
  }
}
