package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic text-hashing kernels shared by the interpreted and
 * code-generated paths of [[SimHash64Expr]] / [[MinHashSignatureExpr]].
 *
 * Beyond-reference scope: near-duplicate detection primitives for
 * training-data pipelines (the reference has no text functions at all,
 * SURVEY.md §2.2). All hashing is FNV-1a 64-bit (public domain algorithm)
 * over UTF-8 bytes, so signatures are stable across JVMs, partitionings,
 * and engine versions — a requirement for incremental dedup at scale,
 * where yesterday's signatures must stay comparable with today's.
 */
object TextHashKernels {

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L
  /** Mersenne prime 2^61 - 1 — modulus of the MinHash permutations. */
  final val MersennePrime: Long = (1L << 61) - 1

  /** FNV-1a 64 over a byte range. */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** SplitMix64 — used to derive the per-permutation (a, b) constants
    * deterministically from the permutation index. */
  def splitMix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Token boundaries of an ASCII-space-tokenized byte array:
    * returns flattened (start, end) offsets of non-empty tokens. */
  private def tokenOffsets(b: Array[Byte]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    val n = b.length
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val start = i
      while (i < n && b(i) != ' ') i += 1
      if (i > start) { out += start; out += i }
    }
    out.toArray
  }

  /**
   * 64-bit SimHash over whitespace tokens: each token's FNV-1a hash
   * votes +1/-1 on each of the 64 bit positions; the sign of each
   * accumulated vote becomes the output bit. Near-duplicate documents
   * land at small Hamming distance. Null text → handled by the caller
   * (expression is null-safe).
   */
  def simhash64(text: UTF8String): Long = {
    val bytes = textBytes(text)
    val offs = tokenOffsets(bytes)
    val votes = new Array[Int](64)
    var t = 0
    while (t < offs.length) {
      val h = fnv1a64(bytes, offs(t), offs(t + 1))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 2
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  private def textBytes(text: UTF8String): Array[Byte] = text.getBytes

  /**
   * MinHash signature over token 3-gram shingles.
   *
   * Shingle hash h = FNV-1a over the shingle's bytes (tokens joined by a
   * single space); permutation i maps h to ((a_i * h + b_i) mod M) where
   * M = 2^61-1 and (a_i, b_i) are SplitMix64-derived from i — the
   * classic universal-hash MinHash construction. Documents shorter than
   * one shingle fall back to whole-token shingles so short docs still
   * get a signature.
   */
  def minhashSignature(text: UTF8String, numHashes: Int): ArrayData = {
    val bytes = textBytes(text)
    val offs = tokenOffsets(bytes)
    val nTokens = offs.length / 2
    val shingleWidth = 3
    val nShingles = math.max(nTokens - shingleWidth + 1, if (nTokens > 0) 1 else 0)
    if (nShingles == 0) {
      return UnsafeArrayData.fromPrimitiveArray(Array.fill(numHashes)(Long.MaxValue))
    }
    // Base hash per shingle: FNV over the token bytes with a space
    // between tokens, computed without materializing the shingle string.
    val shingleHashes = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      val width = math.min(shingleWidth, nTokens - s)
      var h = FnvOffset
      var t = 0
      while (t < width) {
        val start = offs((s + t) * 2)
        val end = offs((s + t) * 2 + 1)
        var i = start
        while (i < end) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
        if (t < width - 1) { h ^= (' ' & 0xffL); h *= FnvPrime }
        t += 1
      }
      shingleHashes(s) = h
      s += 1
    }
    val sig = new Array[Long](numHashes)
    var p = 0
    while (p < numHashes) {
      val a = (splitMix64(2L * p) & MersennePrime) | 1L // odd, < 2^61
      val b = splitMix64(2L * p + 1) & MersennePrime
      var mn = Long.MaxValue
      var i = 0
      while (i < nShingles) {
        // (a * h + b) mod 2^61-1 using 128-bit-free Mersenne reduction:
        // fold the high bits back in (valid because M = 2^61 - 1).
        val h = shingleHashes(i) & MersennePrime
        val prodHi = Math.multiplyHigh(a, h)
        val prodLo = a * h
        // value = prodHi * 2^64 + prodLo; reduce mod 2^61-1:
        // 2^64 mod M = 8, so value ≡ prodHi*8 + prodLo (then fold twice).
        var v = ((prodLo & MersennePrime) + (prodLo >>> 61) + ((prodHi << 3) & MersennePrime) + (prodHi >>> 58) + b)
        v = (v & MersennePrime) + (v >>> 61)
        v = (v & MersennePrime) + (v >>> 61)
        if (v < mn) mn = v
        i += 1
      }
      sig(p) = mn
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Distinct token-3-gram shingles as strings — the exact shingling
    * [[minhashSignature]] hashes, materialized for exact-Jaccard
    * verification. Kernel-backed so it stays inside WholeStageCodegen
    * (a higher-order-function formulation is interpreted per element). */
  def shingleSet(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes)
    val nTokens = offs.length / 2
    val shingleWidth = 3
    val nShingles = math.max(nTokens - shingleWidth + 1, if (nTokens > 0) 1 else 0)
    if (nShingles == 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s < nShingles) {
      val width = math.min(shingleWidth, nTokens - s)
      val from = offs(s * 2)
      val until = offs((s + width - 1) * 2 + 1)
      // tokens are contiguous in the source except for separating
      // spaces; normalize multi-space gaps by rebuilding when needed
      var singleSpaced = true
      var i = from
      var run = 0
      while (i < until && singleSpaced) {
        if (bytes(i) == ' ') { run += 1; if (run > 1) singleSpaced = false }
        else run = 0
        i += 1
      }
      val sh = if (singleSpaced) {
        UTF8String.fromBytes(bytes, from, until - from)
      } else {
        val sb = new java.lang.StringBuilder()
        var t = 0
        while (t < width) {
          val ts = offs((s + t) * 2); val te = offs((s + t) * 2 + 1)
          if (t > 0) sb.append(' ')
          sb.append(new String(bytes, ts, te - ts, java.nio.charset.StandardCharsets.UTF_8))
          t += 1
        }
        UTF8String.fromString(sb.toString)
      }
      seen.add(sh)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(new Array[UTF8String](seen.size)).asInstanceOf[Array[Any]])
  }

  /** MinHash banded LSH keys in one pass: the signature of
    * `bands * rowsPerBand` permutations, folded per band into a single
    * 64-bit bucket key. One kernel call per row — the signature is never
    * re-evaluated per band (lambda-based banding in the plan would
    * interpret, and re-evaluate, the signature once per band). */
  def minhashBandHashes(text: UTF8String, bands: Int, rowsPerBand: Int): ArrayData = {
    val sig = minhashSignature(text, bands * rowsPerBand).toLongArray()
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var h = FnvOffset
      var i = 0
      while (i < rowsPerBand) {
        h = (h ^ splitMix64(sig(j * rowsPerBand + i))) * FnvPrime
        i += 1
      }
      out(j) = h
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // -------------------------------------------------- content chunking

  /** Gear table for the rolling hash: 256 pseudo-random 64-bit values
    * derived deterministically from the byte value via SplitMix64. */
  private val GearTable: Array[Long] = Array.tabulate(256)(i => splitMix64(i.toLong))

  /**
   * Content-defined chunking via a Gear rolling hash: a chunk boundary
   * falls wherever the rolling hash's top `avgBits` bits are zero,
   * bounded by min = avg/4 and max = avg*4 (avg = 2^avgBits bytes).
   * Returns the FNV-1a hash of each chunk — the dedup fingerprints.
   *
   * The CDC property: inserting or deleting bytes shifts only the
   * chunks around the edit; all other chunk boundaries (and hence
   * hashes) are unchanged — which is what makes byte-payload dedup work
   * under re-encodes and prefix edits, unlike fixed-size blocking.
   *
   * The rolling hash is NOT reset at chunk boundaries: `h` at position
   * i depends only on the last ≤ 64 content bytes (the shift pushes
   * older bytes out of the register), so after any edit the hash stream
   * — and with it the boundary candidates — realigns within 64 bytes of
   * common content. Resetting per chunk would tie boundaries to the
   * chunk START, making realignment after a prefix edit probabilistic
   * (measured: as low as ~13% fingerprint survival on a 17-byte prefix
   * insert) instead of structural (≥ ~95%, everything past the edit
   * window).
   */
  def gearChunkHashes(payload: Array[Byte], avgBits: Int): ArrayData = {
    val n = payload.length
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val avg = 1 << avgBits
    val minSize = math.max(1, avg >> 2)
    val maxSize = avg << 2
    val mask = ((1L << avgBits) - 1) << (64 - avgBits)
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / avg + 2)
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + GearTable(payload(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize || i == n) {
        out += fnv1a64(payload, start, i)
        start = i
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  /**
   * One-pass intra-document repetition counts over SQL-`split`
   * semantics (split on ' ' KEEPING empty tokens, so "" is one empty
   * token and consecutive spaces produce empties — byte-identical to
   * `split(text, " ")` / DuckDB `string_split`):
   * `[n_tokens, n_shingles, n_distinct_shingles, n_distinct_tokens,
   * max_token_multiplicity]`.
   *
   * Because consecutive tokens are separated by exactly one space by
   * construction, the token-3-gram joined with ' ' IS the original
   * byte slice from token i's start to token i+2's end — shingles are
   * zero-copy slices, no string building. Exists as a kernel (not
   * builtin HOFs) because Spark's higher-order array functions are
   * `CodegenFallback`: the HOF formulation re-evaluated interpreted
   * lambda trees per output column (measured 13 s vs sub-second at
   * sf0.1 for the same semantics).
   */

  /**
   * Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
   * "Winnowing: Local Algorithms for Document Fingerprinting",
   * SIGMOD 2003 — the MOSS algorithm): FNV-1a-hash every token
   * `n`-gram, slide a window of `w` consecutive gram hashes, select
   * each window's minimum (rightmost position on ties). Guarantee:
   * any shared token run of ≥ n + w - 1 tokens contributes at least
   * one shared selected fingerprint, at expected density 2/(w+1) —
   * the standard way to cut fingerprint volume ~w/2× without losing
   * the match guarantee. Returns the distinct selected hashes in
   * first-selection order; fewer than `w` grams → one window over all
   * of them; fewer than `n` tokens → empty.
   */
  def winnowFingerprints(text: UTF8String, n: Int, w: Int): ArrayData = {
    val bytes = textBytes(text)
    val offs = tokenOffsets(bytes)
    val nTokens = offs.length / 2
    val m = nTokens - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // FNV-1a of each canonical single-spaced token n-gram, hashed
    // directly from the token byte slices (never materialized)
    val hashes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var h = FnvOffset
      var t = 0
      while (t < n) {
        if (t > 0) { h ^= (' ' & 0xffL); h *= FnvPrime }
        var i = offs((s + t) * 2)
        val until = offs((s + t) * 2 + 1)
        while (i < until) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
        t += 1
      }
      hashes(s) = h
      s += 1
    }
    // slide the window; select each window's minimum (unsigned order —
    // the oracle compares the same values as HUGEINTs), rightmost on
    // ties. Fewer than w grams → one window over all of them.
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = math.max(m - w, 0)
    var st = 0
    while (st <= lastStart) {
      val end = math.min(st + w, m)
      var best = st
      var i = st + 1
      while (i < end) {
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(best)) <= 0) best = i
        i += 1
      }
      selected.add(hashes(best))
      st += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def repetitionCounts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token boundaries: starts(k)/ends(k) of the k-th token
    val starts = new scala.collection.mutable.ArrayBuffer[Int](32)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](32)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts += start
        ends += i
        start = i + 1
      }
      i += 1
    }
    val nTokens = starts.length
    val tokenCounts = new java.util.HashMap[UTF8String, Array[Int]](nTokens * 2)
    var maxMult = 0
    var t = 0
    while (t < nTokens) {
      val tok = UTF8String.fromBytes(bytes, starts(t), ends(t) - starts(t))
      val c = tokenCounts.computeIfAbsent(tok, _ => new Array[Int](1))
      c(0) += 1
      if (c(0) > maxMult) maxMult = c(0)
      t += 1
    }
    val nShingles = math.max(nTokens - 2, 0)
    val distinctShingles = new java.util.HashSet[UTF8String](nShingles * 2)
    t = 0
    while (t < nShingles) {
      distinctShingles.add(
        UTF8String.fromBytes(bytes, starts(t), ends(t + 2) - starts(t)))
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array[Long](
      nTokens.toLong, nShingles.toLong, distinctShingles.size.toLong,
      tokenCounts.size.toLong, maxMult.toLong))
  }

  /**
   * Per-position n-gram windows for count-based language modelling:
   * element i (1-based over the SQL-`split`-on-' ' fields, empties
   * kept) is the last `min(i, 3)` tokens ending at token i, joined by
   * single spaces — "c", "b c", "a b c", "b c d", … Because fields are
   * delimited by exactly one space, every window is a CONTIGUOUS byte
   * slice of the source text, so the kernel emits zero-copy slices: one
   * O(n) boundary scan, no string rebuilding. The scoring plan derives
   * every backoff key from the window with `substring_index` (first/last
   * k fields), keeping the whole trigram pipeline inside codegen'd
   * string ops — no higher-order functions.
   */
  def gramWindows(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = new scala.collection.mutable.ArrayBuffer[Int](32)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](32)
    var fieldStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts += fieldStart
        ends += i
        fieldStart = i + 1
      }
      i += 1
    }
    val m = starts.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val from = starts(math.max(0, j - 2))
      out(j) = UTF8String.fromBytes(bytes, from, ends(j) - from)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Codepoint split — the initial BPE symbol sequence of a word.
    * Codepoints (not UTF-16 units) so Scala matches the oracle's
    * per-character `substr` semantics beyond the BMP. */
  def splitCodepoints(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One BPE merge round: greedy left-to-right non-overlapping
    * replacement of adjacent (l, r) with l+r — the apply semantics of
    * Sennrich et al. 2016, shared verbatim by the tokenize kernel and
    * the training loop so train/apply can never diverge. */
  def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /**
   * Apply a trained merge list (rank order, "l r" strings) to one word
   * and return the space-joined subword sequence. Called on the
   * DISTINCT-words relation, never per token instance — the zipfian
   * corpus probes each word once.
   */
  def bpeApply(word: UTF8String, merges: ArrayData): UTF8String = {
    var syms = splitCodepoints(word.toString)
    val nm = merges.numElements()
    var m = 0
    while (m < nm && syms.length > 1) {
      val pair = merges.getUTF8String(m).toString
      val sp = pair.indexOf(' ')
      if (sp > 0) syms = mergeOnce(syms, pair.substring(0, sp), pair.substring(sp + 1))
      m += 1
    }
    UTF8String.fromString(syms.mkString(" "))
  }

  /**
   * Count whitespace tokens (SQL-`split` semantics, empties kept)
   * that equal any of `words` — the marker/stopword counter behind
   * language ID and the quality score. One pass, no token array
   * materialized; a kernel because `filter(toks, _.isin(...))` is a
   * `CodegenFallback` higher-order function (interpreted per row).
   */
  /**
   * Count occurrences (overlaps included) of a token PHRASE — m
   * consecutive non-empty whitespace tokens equal to `phrase` — in
   * one pass over the text bytes: a ring buffer of the last m token
   * spans, compared byte-wise against the phrase at each step. No
   * token array, no gram strings (the `transform`+`concat_ws` HOF
   * formulation allocates a string per corpus token and runs
   * interpreted — measured 6× slower at sf0.1). Empty tokens (double
   * spaces) are skipped, matching the filtered-token semantics of the
   * retrieval operators.
   */
  def phraseCount(text: UTF8String, phrase: ArrayData): Long = {
    val m = phrase.numElements()
    if (m == 0) return 0L
    val pb = new Array[Array[Byte]](m)
    var j = 0
    while (j < m) {
      val p = phrase.getUTF8String(j)
      if (p == null) return 0L
      pb(j) = p.getBytes
      j += 1
    }
    val bytes = text.getBytes
    val n = bytes.length
    val starts = new Array[Int](m)
    val lens = new Array[Int](m)
    var seen = 0
    var cnt = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        if (len > 0) {
          starts(seen % m) = start
          lens(seen % m) = len
          seen += 1
          if (seen >= m) {
            var k = 0
            var ok = true
            while (k < m && ok) {
              val idx = (seen - m + k) % m
              val p = pb(k)
              ok = lens(idx) == p.length
              var b = 0
              val s0 = starts(idx)
              while (ok && b < p.length) { ok = bytes(s0 + b) == p(b); b += 1 }
              k += 1
            }
            if (ok) cnt += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    cnt
  }

  def tokenHits(text: UTF8String, words: ArrayData): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val nw = words.numElements()
    var hits = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        var w = 0
        var matched = false
        while (w < nw && !matched) {
          val word = words.getUTF8String(w)
          if (word.numBytes() == len) {
            var j = 0
            val wb = word.getBytes
            matched = true
            while (j < len && matched) {
              if (wb(j) != bytes(start + j)) matched = false
              j += 1
            }
          }
          w += 1
        }
        if (matched) hits += 1
        start = i + 1
      }
      i += 1
    }
    hits
  }

  /**
   * One-pass clipped n-gram overlap counts for the generation-eval
   * metrics (BLEU, chrF, ROUGE-n, token-F1): for each order
   * n = 1..maxN over the (pred, gold) pair IN THE SAME ROW, emits
   * `[overlap_n, total_pred_n, total_gold_n]` flattened to a
   * 3·maxN array<bigint>, where overlap_n = Σ_gram
   * min(count_pred(gram), count_gold(gram)) — the multiset (clipped)
   * intersection every one of those metrics is built on.
   *
   * `charLevel = true`: units are CODE POINTS of the space-stripped
   * string — bit-identical to `regexp_replace(s, ' ', '')` + SQL
   * `substring` windows (both count code points; 0x20 never occurs
   * inside a multibyte UTF-8 sequence, so the strip is byte-local).
   * `charLevel = false`: units are the single-space-split fields with
   * empties KEPT, like SQL `split(s, ' ')` — an empty string has ONE
   * empty token — and an order-n gram is the n-field window joined by
   * single spaces, which over a single-space delimiter is a CONTIGUOUS
   * byte slice of the source (zero-copy, the [[gramWindows]] trick).
   * A NULL side contributes zero units on that side (the pre-kernel
   * plans filtered NULLs per side before exploding, so a null pred
   * still lets gold count toward total_gold).
   *
   * Why a kernel and not builtins: the HOF formulation
   * (`transform(sequence(...))` per order + explode + per-(id, n,
   * gram) hash aggregate + full-outer STRING join) shuffles every
   * character position × order as a struct<int,string> row — measured
   * 15–40 s on the sf0.1 chrF bench row and super-linear on the 10×
   * sf step (the round-10 scale-killer). Pred and gold live in the
   * same row, so the clipped overlap is scan-local; this kernel
   * replaces the explode + shuffle + join with 3·maxN integers per
   * row feeding one global sum — the [[repetitionCounts]] precedent
   * (round 6: 13 s → 0.44 s). At 100 TB of eval pairs the whole
   * metric is one scan and an 18-integer reduce.
   */
  def ngramOverlapCounts(
      pred: UTF8String, gold: UTF8String,
      maxN: Int, charLevel: Boolean): ArrayData = {
    // mirrors the GenEval operator guard: [1, 8] — a negative value
    // would throw NegativeArraySizeException two lines down, and 0
    // would silently return an empty array
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val (pb, ps, pe) = unitBoundaries(pred, charLevel)
    val (gb, gs, ge) = unitBoundaries(gold, charLevel)
    val out = new Array[Long](3 * maxN)
    // one map reused across orders: clear() keeps capacity, so the
    // rehash cost is paid once per row, not once per order
    val map = new java.util.HashMap[UTF8String, Array[Int]](64)
    var n = 1
    while (n <= maxN) {
      val tp = math.max(ps.length - n + 1, 0)
      val tg = math.max(gs.length - n + 1, 0)
      var ov = 0L
      if (tp > 0 && tg > 0) {
        map.clear()
        var k = 0
        while (k < tp) {
          val g = UTF8String.fromBytes(pb, ps(k), pe(k + n - 1) - ps(k))
          val c = map.get(g)
          if (c == null) map.put(g, Array(1)) else c(0) += 1
          k += 1
        }
        k = 0
        while (k < tg) {
          val g = UTF8String.fromBytes(gb, gs(k), ge(k + n - 1) - gs(k))
          val c = map.get(g)
          if (c != null && c(0) > 0) { c(0) -= 1; ov += 1L }
          k += 1
        }
      }
      out(3 * (n - 1)) = ov
      out(3 * (n - 1) + 1) = tp.toLong
      out(3 * (n - 1) + 2) = tg.toLong
      n += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Parsed WordPiece vocabulary: raw match texts for word-initial
    * tokens and for `##`-continuation tokens (prefix stripped). Keyed
    * by vocab content (UnsafeArrayData/GenericArrayData equality is
    * content-based), capped — the vocab argument is a query literal,
    * so a real workload holds one entry. */
  private val wpVocabCache =
    new java.util.concurrent.ConcurrentHashMap[ArrayData,
      (java.util.HashSet[String], java.util.HashSet[String])]()

  private def wpVocabSets(
      vocab: ArrayData): (java.util.HashSet[String], java.util.HashSet[String]) = {
    val hit = wpVocabCache.get(vocab)
    if (hit != null) return hit
    val plain = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    val n = vocab.numElements()
    var i = 0
    while (i < n) {
      val t = vocab.getUTF8String(i).toString
      if (t.length > 2 && t.startsWith("##")) cont.add(t.substring(2))
      else plain.add(t)
      i += 1
    }
    if (wpVocabCache.size() > 8) wpVocabCache.clear()
    val v = (plain, cont)
    wpVocabCache.put(vocab.copy(), v)
    v
  }

  /**
   * WordPiece greedy longest-match segmentation (Schuster & Nakajima
   * 2012; the BERT tokenizer): at each position match the LONGEST
   * vocab token — word-initial tokens at position 0, `##`-prefixed
   * continuation tokens after — and emit the space-joined pieces in
   * their vocab spelling; any position with no match collapses the
   * WHOLE word to `[UNK]` (the BERT convention). Positions are code
   * points ([[splitCodepoints]]), matching SQL `substr`/`length`
   * semantics. A vocab string starting with `##` IS a continuation —
   * the standard convention; words whose TEXT literally starts with
   * `##` segment through their single-`#` initial symbols.
   *
   * Called on the DISTINCT-words relation like [[bpeApply]] — the
   * zipfian corpus probes each word type once; the vocab sets parse
   * once per literal through a content-keyed cache.
   */
  def wordpieceApply(word: UTF8String, vocab: ArrayData): UTF8String = {
    val ws = word.toString
    val cps = splitCodepoints(ws)
    if (cps.isEmpty) return UTF8String.fromString("")
    // Java-char offset of each code-point boundary: candidate windows
    // become O(1) substrings of the original string
    val offs = new Array[Int](cps.length + 1)
    var i = 0
    while (i < cps.length) { offs(i + 1) = offs(i) + cps(i).length; i += 1 }
    val (plain, cont) = wpVocabSets(vocab)
    val out = new java.lang.StringBuilder(word.numBytes() + 8)
    var start = 0
    while (start < cps.length) {
      val set = if (start == 0) plain else cont
      var end = cps.length
      var hit: String = null
      while (end > start && hit == null) {
        val sub = ws.substring(offs(start), offs(end))
        if (set.contains(sub)) hit = sub else end -= 1
      }
      if (hit == null) return UTF8String.fromString("[UNK]")
      if (start > 0) out.append(" ##")
      out.append(hit)
      start = end
    }
    UTF8String.fromString(out.toString)
  }

  /**
   * Jaro–Winkler similarity (Jaro 1989; Winkler 1990) over UTF-8
   * BYTES — the unit DuckDB's native `jaro_winkler_similarity` uses
   * (verified: 'héllo' vs 'hello' = 0.84 there, the byte answer), so
   * the oracle is a genuinely independent implementation of the same
   * function. Conventions pinned to DuckDB's: m = 0 (including
   * either side empty) scores 0; match window
   * ⌊max(|a|,|b|)/2⌋ − 1 (≥ 0); transpositions = half the
   * order-mismatches among matched units; Winkler boost
   * `jw = jaro + ℓ·0.1·(1 − jaro)` applied only when jaro > 0.7,
   * with common-prefix ℓ capped at 4. One fused pass per pair —
   * scan-local, the fuzzy-join verification step after blocking.
   */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val ab = a.getBytes; val bb = b.getBytes
    val la = ab.length; val lb = bb.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val bMatched = new Array[Boolean](lb)
    val aMatched = new Array[Boolean](la)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!bMatched(j) && ab(i) == bb(j)) {
          bMatched(j) = true; aMatched(i) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(j)) j += 1
        if (ab(i) != bb(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && ab(l) == bb(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Unit kinds for [[editDistance]]. */
  final val UnitByte = 0
  final val UnitCodepoint = 1
  final val UnitToken = 2

  /**
   * Levenshtein edit distance between `a` and `b` over one of three
   * unit alphabets:
   *
   *  - `UnitByte`: raw UTF-8 bytes — bit-identical to DuckDB /
   *    ClickHouse `levenshtein`, which are byte-level (verified:
   *    levenshtein('héllo','hello') = 2 there). The engine-exact
   *    choice when an external byte-level oracle must replay it.
   *  - `UnitCodepoint`: Unicode code points — the semantics of
   *    Spark's own builtin `levenshtein` (pinned equal in the spec).
   *  - `UnitToken`: single-space-split fields with empties kept (the
   *    package's SQL `split` convention) — word error rate's unit.
   *
   * Myers' bit-parallel algorithm (Myers 1999, blocked per Hyyrö
   * 2003 — the edlib formulation): the shorter side becomes the
   * pattern, its unit-match masks pack 64 rows per machine word, and
   * each text unit advances all ⌈m/64⌉ blocks with carry chains —
   * O(mn/64) word ops instead of O(mn) cells (measured 10× on the
   * 2 KB-doc CER bench row — 3.77 → 0.37 s at sf0.1 — vs the scalar
   * two-row DP this replaced).
   * Scan-local per row (pred and gold live in the same row), so
   * CER/WER at 100 TB are a projection plus whatever reduce the
   * caller adds; for long-document similarity use the dedup family,
   * not edit distance.
   */
  def editDistance(a: UTF8String, b: UTF8String, unit: Int): Long = {
    require(unit >= UnitByte && unit <= UnitToken,
      s"unit must be 0 (byte), 1 (codepoint) or 2 (token), got $unit")
    val ua = editUnits(a, unit)
    val ub = editUnits(b, unit)
    // shorter side = pattern (fewer blocks; distance is symmetric)
    val ((pb, ps, pe), (tb, ts, te)) =
      if (ua._2.length <= ub._2.length) (ua, ub) else (ub, ua)
    val m = ps.length
    val n = ts.length
    if (m == 0) return n.toLong
    val blocks = (m + 63) >>> 6
    // Peq: per text-alphabet row, bit i set iff pattern unit i equals
    // that symbol. Byte mode indexes a dense 256-row table; the other
    // modes intern pattern units into ids (unknown text unit → the
    // all-zero row 0).
    val (peq, rowOf): (Array[Long], Int => Int) =
      if (unit == UnitByte) {
        val t = new Array[Long](256 * blocks)
        var i = 0
        while (i < m) {
          val r = pb(ps(i)) & 0xFF
          t(r * blocks + (i >>> 6)) |= 1L << (i & 63)
          i += 1
        }
        (t, j => (tb(ts(j)) & 0xFF) * blocks)
      } else {
        val ids = new java.util.HashMap[UTF8String, Integer](m * 2)
        val rows = new Array[Int](m)
        var next = 1
        var i = 0
        while (i < m) {
          val key = UTF8String.fromBytes(pb, ps(i), pe(i) - ps(i))
          var id = ids.get(key)
          if (id == null) { id = Integer.valueOf(next); ids.put(key, id); next += 1 }
          rows(i) = id.intValue()
          i += 1
        }
        val t = new Array[Long](next * blocks)
        i = 0
        while (i < m) {
          t(rows(i) * blocks + (i >>> 6)) |= 1L << (i & 63)
          i += 1
        }
        (t, { j: Int =>
          val id = ids.get(UTF8String.fromBytes(tb, ts(j), te(j) - ts(j)))
          (if (id == null) 0 else id.intValue()) * blocks
        })
      }
    val pv = new Array[Long](blocks)
    val mv = new Array[Long](blocks)
    java.util.Arrays.fill(pv, -1L)
    var score = m.toLong
    val lastBit = (m - 1) & 63
    var j = 0
    while (j < n) {
      val base = rowOf(j)
      var hin = 1 // top boundary: D[0][j] − D[0][j−1] = +1
      var k = 0
      while (k < blocks) {
        var eq = peq(base + k)
        val pvk = pv(k)
        val mvk = mv(k)
        val xv = eq | mvk
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvk) + pvk) ^ pvk) | eq
        var ph = mvk | ~(xh | pvk)
        var mh = pvk & xh
        val hb = if (k == blocks - 1) lastBit else 63
        val hout =
          if (((ph >>> hb) & 1L) != 0) 1
          else if (((mh >>> hb) & 1L) != 0) -1
          else 0
        ph <<= 1
        mh <<= 1
        if (hin < 0) mh |= 1L else if (hin > 0) ph |= 1L
        pv(k) = mh | ~(xv | ph)
        mv(k) = ph & xv
        hin = hout
        k += 1
      }
      score += hin
      j += 1
    }
    score
  }

  /**
   * TRUE Damerau–Levenshtein distance (Lowrance & Wagner 1975 —
   * unrestricted adjacent transposition, so 'ca' → 'abc' is 2, not
   * OSA's 3) over raw UTF-8 BYTES — probed bit-identical to DuckDB's
   * `damerau_levenshtein` ('héllo'→'hello' = 2, byte-level; 'ca'→
   * 'abc' = 2). The spell-correction/ER metric for short strings:
   * the full (m+2)×(n+2) matrix the transposition lookback needs is
   * quadratic space, so inputs are capped at 512 bytes per side —
   * names/titles territory; for long-text error rates use
   * [[editDistance]] (bit-parallel, linear space).
   */
  def damerauDistance(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val m = ab.length
    val n = bb.length
    require(m <= 512 && n <= 512,
      s"damerau_distance supports strings up to 512 bytes per side " +
        s"(names/titles); got $m and $n — use edit_distance for long text")
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    val inf = m + n
    val d = Array.ofDim[Int](m + 2, n + 2)
    val da = new Array[Int](256) // last row where each byte occurred in a
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k = da(bb(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (ab(i - 1) == bb(j - 1)) { cost = 0; db = j }
        val viaEdit = math.min(d(i)(j) + cost,
          math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1))
        val viaTrans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(viaEdit, viaTrans)
        j += 1
      }
      da(ab(i - 1) & 0xFF) = i
      i += 1
    }
    d(m + 1)(n + 1).toLong
  }

  /** Unit boundaries for [[editDistance]] — byte / code point / token
    * segmentation of the raw UTF-8 bytes (no whitespace stripping;
    * token mode splits on single spaces keeping empties). */
  private def editUnits(
      text: UTF8String, unit: Int): (Array[Byte], Array[Int], Array[Int]) = {
    val raw = text.getBytes
    unit match {
      case UnitByte =>
        val starts = new Array[Int](raw.length)
        val ends = new Array[Int](raw.length)
        var i = 0
        while (i < raw.length) { starts(i) = i; ends(i) = i + 1; i += 1 }
        (raw, starts, ends)
      case UnitCodepoint =>
        var cps = 0
        var i = 0
        while (i < raw.length) {
          i += UTF8String.numBytesForFirstByte(raw(i)); cps += 1
        }
        val starts = new Array[Int](cps)
        val ends = new Array[Int](cps)
        i = 0
        var k = 0
        while (i < raw.length) {
          starts(k) = i
          i += UTF8String.numBytesForFirstByte(raw(i))
          ends(k) = math.min(i, raw.length)
          k += 1
        }
        (raw, starts, ends)
      case _ =>
        var spaces = 0
        var i = 0
        while (i < raw.length) { if (raw(i) == 0x20) spaces += 1; i += 1 }
        val starts = new Array[Int](spaces + 1)
        val ends = new Array[Int](spaces + 1)
        var k = 0
        var st = 0
        i = 0
        while (i <= raw.length) {
          if (i == raw.length || raw(i) == 0x20) {
            starts(k) = st; ends(k) = i; k += 1; st = i + 1
          }
          i += 1
        }
        (raw, starts, ends)
    }
  }

  /** Unit boundaries for [[ngramOverlapCounts]]: (bytes, unit byte
    * starts, unit byte ends). Char level strips 0x20 and walks code
    * points with Spark's own [[UTF8String.numBytesForFirstByte]] so
    * window slicing agrees with SQL `substring` byte-for-byte; token
    * level splits on single spaces keeping empties (a non-null input
    * always has ≥ 1 token, like SQL `split`). NULL → zero units. */
  private def unitBoundaries(
      text: UTF8String,
      charLevel: Boolean): (Array[Byte], Array[Int], Array[Int]) = {
    if (text == null)
      return (Array.emptyByteArray, emptyInts, emptyInts)
    val raw = text.getBytes
    if (charLevel) {
      val b = new Array[Byte](raw.length)
      var m = 0
      var i = 0
      while (i < raw.length) {
        if (raw(i) != 0x20) { b(m) = raw(i); m += 1 }
        i += 1
      }
      var cps = 0
      i = 0
      while (i < m) {
        i += UTF8String.numBytesForFirstByte(b(i))
        cps += 1
      }
      val starts = new Array[Int](cps)
      val ends = new Array[Int](cps)
      i = 0
      var k = 0
      while (i < m) {
        starts(k) = i
        i += UTF8String.numBytesForFirstByte(b(i))
        // a truncated final sequence still ends at the buffer edge
        ends(k) = math.min(i, m)
        k += 1
      }
      (b, starts, ends)
    } else {
      var spaces = 0
      var i = 0
      while (i < raw.length) {
        if (raw(i) == 0x20) spaces += 1
        i += 1
      }
      val u = spaces + 1
      val starts = new Array[Int](u)
      val ends = new Array[Int](u)
      var k = 0
      var st = 0
      i = 0
      while (i <= raw.length) {
        if (i == raw.length || raw(i) == 0x20) {
          starts(k) = st
          ends(k) = i
          k += 1
          st = i + 1
        }
        i += 1
      }
      (raw, starts, ends)
    }
  }

  private val emptyInts = new Array[Int](0)

  /**
   * Deletion-neighborhood signature hashes (the FastSS / SymSpell
   * blocking family): the FNV-1a 64 hash of the string itself plus the
   * hash of every single-CODE-POINT-deletion variant, deduplicated
   * (deleting any character of an equal-character run yields the same
   * variant) and sorted. Two strings with Levenshtein distance ≤ 1
   * always share at least one signature, so an equality join on these
   * hashes is a COMPLETE blocking for τ = 1.
   *
   * No variant string is ever materialized: each deletion hash is the
   * prefix hash up to the deleted code point's first byte, continued
   * over the suffix bytes — O(|s|) per variant, O(|s|²) bytes hashed
   * total, zero allocations beyond the output array. This kernel
   * replaces the `transform(sequence(...))` higher-order-function
   * formulation (a CodegenFallback) so signature generation stays
   * inside whole-stage codegen.
   */
  def deletionNeighborhoodHashes(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val n = b.length
    // code-point start offsets
    var cps = 0
    var i = 0
    while (i < n) {
      i += UTF8String.numBytesForFirstByte(b(i))
      cps += 1
    }
    val starts = new Array[Int](cps + 1)
    i = 0
    var k = 0
    while (i < n) {
      starts(k) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      k += 1
    }
    starts(cps) = n
    // prefix(j) = FNV-1a state after hashing bytes [0, starts(j))
    val prefix = new Array[Long](cps + 1)
    prefix(0) = FnvOffset
    k = 0
    while (k < cps) {
      var h = prefix(k)
      var j = starts(k)
      val until = starts(k + 1)
      while (j < until) {
        h ^= (b(j) & 0xffL)
        h *= FnvPrime
        j += 1
      }
      prefix(k + 1) = h
      k += 1
    }
    val out = new Array[Long](cps + 1)
    out(0) = prefix(cps) // identity signature
    k = 0
    while (k < cps) {
      // delete code point k: continue prefix(k) over bytes [starts(k+1), n)
      var h = prefix(k)
      var j = starts(k + 1)
      while (j < n) {
        h ^= (b(j) & 0xffL)
        h *= FnvPrime
        j += 1
      }
      out(k + 1) = h
      k += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /**
   * Adjacent-token co-occurrence pairs for the TextRank graph: for a
   * single-space-tokenized string (Spark `split(text, " ")` limit -1
   * semantics — all empty tokens kept), every adjacent pair (a, b)
   * with BOTH sides at least `minLen` CODE POINTS and a ≠ b, emitted
   * in both directions as (src, dst) structs — the exact relation the
   * `explode(sequence)`/`element_at`/`explode(array(struct))`
   * double-Generate pipeline produced, in one scan-local pass with no
   * per-pair array re-evaluation (that pipeline was ~75% of
   * `text_rank_terms`' cost, SCALING.md round 13).
   */
  def adjacentTokenPairs(text: UTF8String, minLen: Int): ArrayData = {
    val b = text.getBytes
    // token ranges of split(" ", limit = -1)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](16)
    var st = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        starts += st; ends += i; st = i + 1
      }
      i += 1
    }
    val n = starts.length
    val toks = new Array[UTF8String](n)
    val cps = new Array[Int](n)
    var t = 0
    while (t < n) {
      toks(t) = UTF8String.fromBytes(b, starts(t), ends(t) - starts(t))
      cps(t) = toks(t).numChars()
      t += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.catalyst.InternalRow](16)
    t = 0
    while (t < n - 1) {
      if (cps(t) >= minLen && cps(t + 1) >= minLen &&
          !toks(t).equals(toks(t + 1))) {
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](toks(t), toks(t + 1)))
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](toks(t + 1), toks(t)))
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /**
   * DSIR feature buckets (Xie et al. 2023): the md5-nibble bucket of
   * every unigram and every adjacent bigram of a single-space-tokenized
   * string — ((md5[0] << 8) | md5[1]) % buckets, i.e. the first 4 hex
   * nibbles of the digest, the [[graft.operators.SeededHash]]
   * arithmetic.
   *
   * Tokenization replicates Spark's `split(text, " ")` (default limit
   * -1) to the byte: boundaries at every single 0x20 and ALL empty
   * tokens kept — interior and trailing (Spark's split keeps trailing
   * empties, unlike Java's default) — and the empty string yields one
   * empty token; so this kernel is a drop-in for the
   * `split`/`transform(sequence(...))`/`concat` higher-order-function
   * pipeline (a CodegenFallback) it replaces, with no n-gram string
   * ever materialized: unigrams digest a byte slice of the input,
   * bigrams digest sliceA ++ 0x20 ++ sliceB via incremental updates.
   * Output order is all unigrams then all bigrams, matching
   * `concat(toks, bis)`.
   */
  def hashedNgramBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val b = text.getBytes
    // token ranges of split(" ", limit = -1): every empty token kept
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](16)
    var st = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        starts += st; ends += i; st = i + 1
      }
      i += 1
    }
    val n = starts.length
    val md = md5Local.get()
    def bucketOf(): Int = {
      val d = md.digest()
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % buckets
    }
    val out = new Array[Int](n + (if (n >= 2) n - 1 else 0))
    var t = 0
    while (t < n) {
      md.reset()
      md.update(b, starts(t), ends(t) - starts(t))
      out(t) = bucketOf()
      t += 1
    }
    t = 0
    while (t < n - 1) {
      md.reset()
      md.update(b, starts(t), ends(t) - starts(t))
      md.update(0x20.toByte)
      md.update(b, starts(t + 1), ends(t + 1) - starts(t + 1))
      out(n + t) = bucketOf()
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * All order-`n` token n-grams of a single-space-tokenized string,
   * space-joined, in position order — the distinct-n unit (Li et al.
   * 2016). Tokenization replicates Spark's `split(text, " ")` (limit
   * -1, every empty token kept, `""` → one empty token), so this is a
   * drop-in for the `explode(transform(sequence(...), i ->
   * concat_ws(' ', slice(split(text, ' '), i, n))))` higher-order
   * pipeline (a CodegenFallback Generate) it replaces. Because the
   * tokens are separated by exactly one 0x20 each, the join of any
   * consecutive window is literally a byte slice of the input — no
   * per-gram concatenation, one `UTF8String.fromBytes` view per gram.
   * Fewer than `n` tokens → empty array.
   */
  def ngramStrings(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    // token ranges of split(" ", limit = -1): every empty token kept
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](16)
    var st = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        starts += st; ends += i; st = i + 1
      }
      i += 1
    }
    val nToks = starts.length
    val cnt = if (nToks >= n) nToks - n + 1 else 0
    val out = new Array[Any](cnt)
    var t = 0
    while (t < cnt) {
      val from = starts(t)
      out(t) = UTF8String.fromBytes(b, from, ends(t + n - 1) - from)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /**
   * One-pass masked-LM corruption (BERT-style single-token masking at
   * rate 1/`oneIn`): returns the struct `(n_tokens, n_masked,
   * input_text, target_text)` that the
   * `transform`/`zip_with`/`aggregate` higher-order formulation (three
   * CodegenFallback trees per row) computed, bit-for-bit. Position `p`
   * (1-based) is masked iff the first 4 hex nibbles of
   * `md5(id || ':' || p)` — the [[graft.operators.SeededHash]]
   * arithmetic, here read directly from the digest's first two bytes —
   * are ≡ 0 (mod oneIn). Tokenization replicates Spark's
   * `split(text, " ")` (limit -1, empties kept).
   *
   * Null semantics mirror the HOF tree exactly: `text` NULL →
   * `(null, null, "", "")` (size/aggregate of a null array are NULL,
   * `concat_ws` of one is `""`); `id` NULL → every flag is NULL, so
   * nothing masks: `(n_tokens, 0, text, "")`. The struct itself is
   * never NULL.
   */
  def mlmMask(id: UTF8String, text: UTF8String, oneIn: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val Empty = UTF8String.EMPTY_UTF8
    if (text == null) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, Empty, Empty))
    }
    val b = text.getBytes
    // token ranges of split(" ", limit = -1): every empty token kept
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](16)
    var st = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        starts += st; ends += i; st = i + 1
      }
      i += 1
    }
    val nToks = starts.length
    if (id == null) {
      // no position can mask: input is the verbatim re-join (= text)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nToks.toLong, 0L, text, Empty))
    }
    val idBytes = id.getBytes
    val md = md5Local.get()
    val flags = new Array[Boolean](nToks)
    var nMasked = 0
    var p = 0
    while (p < nToks) {
      md.reset()
      md.update(idBytes)
      md.update(':'.toByte)
      md.update(String.valueOf(p + 1)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val d = md.digest()
      if ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % oneIn == 0) {
        flags(p) = true; nMasked += 1
      }
      p += 1
    }
    val MaskBytes = MlmMaskBytes
    // input: tokens with masked positions replaced, single-space joined
    var inLen = if (nToks > 0) nToks - 1 else 0
    var tgtLen = if (nMasked > 0) nMasked - 1 else 0
    p = 0
    while (p < nToks) {
      val tokLen = ends(p) - starts(p)
      inLen += (if (flags(p)) MaskBytes.length else tokLen)
      if (flags(p)) tgtLen += tokLen
      p += 1
    }
    val inB = new Array[Byte](inLen)
    val tgtB = new Array[Byte](tgtLen)
    var io = 0
    var to = 0
    var mi = 0
    p = 0
    while (p < nToks) {
      if (p > 0) { inB(io) = 0x20; io += 1 }
      val tokLen = ends(p) - starts(p)
      if (flags(p)) {
        System.arraycopy(MaskBytes, 0, inB, io, MaskBytes.length)
        io += MaskBytes.length
        if (mi > 0) { tgtB(to) = 0x20; to += 1 }
        mi += 1
        System.arraycopy(b, starts(p), tgtB, to, tokLen)
        to += tokLen
      } else {
        System.arraycopy(b, starts(p), inB, io, tokLen)
        io += tokLen
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nToks.toLong, nMasked.toLong,
        UTF8String.fromBytes(inB), UTF8String.fromBytes(tgtB)))
  }

  private val MlmMaskBytes: Array[Byte] =
    "[MASK]".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
}
