package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the text-hashing primitives (SimHash,
 * MinHash) used by the near-duplicate-detection operators. Same design
 * as the vector expressions: the interpreted path and `doGenCode` both
 * call the static [[TextHashKernels]], so eval ≡ codegen by construction
 * and the hot loop stays inside WholeStageCodegen.
 */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.simhash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash64($c)")

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `minhash_signature(text, numHashes)` → array<bigint>. numHashes must
 * be a foldable positive int (it shapes the output, like `round`'s
 * scale argument).
 */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature numHashes must be positive, got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.minhashSignature(v.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.minhashSignature($c, $numHashes)")

  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `shingle_set(text)` → array<string>: the distinct token-3-gram
 * shingles that `minhash_signature` hashes — materialized for exact
 * Jaccard verification of LSH candidates.
 */
case class ShingleSetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.shingleSet(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.shingleSet($c)")

  override def prettyName: String = "shingle_set"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `gram_windows(text)` → array<string>: per-position trigram windows
 * (last ≤3 space-split tokens ending at each position) — the single
 * exploded relation behind count-based language-model training AND
 * stupid-backoff scoring (see [[TextHashKernels.gramWindows]]).
 */
case class GramWindowsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_windows requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.gramWindows(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.gramWindows($c)")

  override def prettyName: String = "gram_windows"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `token_hits(text, words)` → bigint: whitespace tokens equal to any of
 * `words` (see [[TextHashKernels.tokenHits]]) — the codegen'd
 * marker/stopword counter for language ID and quality scoring.
 */
case class TokenHitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hits requires (string, array<string>), got $other")
  }

  override def nullSafeEval(text: Any, words: Any): Any =
    TextHashKernels.tokenHits(text.asInstanceOf[UTF8String], words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.TextHashKernels.tokenHits($t, $w)")

  override def prettyName: String = "token_hits"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `repetition_counts(text)` → array<bigint> `[n_tokens, n_shingles,
 * n_distinct_shingles, n_distinct_tokens, max_token_multiplicity]` —
 * the one-pass kernel behind
 * [[graft.operators.TextAnalysis.repetitionStats]]
 * (see [[TextHashKernels.repetitionCounts]] for why this is a kernel
 * and not builtin higher-order functions).
 */
case class RepetitionCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_counts requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.repetitionCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.repetitionCounts($c)")

  override def prettyName: String = "repetition_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `minhash_band_hashes(text, bands, rowsPerBand)` → array<bigint>: one
 * LSH bucket key per band, computed in a single kernel pass.
 */
case class MinHashBandHashesExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bands > 0 && rowsPerBand > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_hashes bands/rowsPerBand must be positive, got $bands/$rowsPerBand")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_hashes requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.minhashBandHashes(v.asInstanceOf[UTF8String], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.minhashBandHashes($c, $bands, $rowsPerBand)")

  override def prettyName: String = "minhash_band_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `content_chunk_hashes(payload, avgBits)` → array<bigint>: Gear-hash
 * content-defined chunking of a binary payload; each element is the
 * FNV-1a fingerprint of one chunk. The byte-payload dedup primitive
 * for multimodal columns.
 */
case class ContentChunkHashesExpr(child: Expression, avgBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if avgBits >= 1 && avgBits <= 30 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"content_chunk_hashes avgBits must be in [1, 30], got $avgBits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"content_chunk_hashes requires binary, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.gearChunkHashes(v.asInstanceOf[Array[Byte]], avgBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.gearChunkHashes($c, $avgBits)")

  override def prettyName: String = "content_chunk_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `winnow_fingerprints(text, n, w)` → array<bigint>: winnowing-selected
 * token n-gram FNV-1a fingerprints
 * (see [[TextHashKernels.winnowFingerprints]]).
 */
case class WinnowFingerprintsExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints n and w must be positive, got n=$n w=$w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.winnowFingerprints(v.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.winnowFingerprints($c, $n, $w)")

  override def prettyName: String = "winnow_fingerprints"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `bpe_apply(word, merges)` → string: apply a trained BPE merge list
 * (rank-ordered "l r" pair strings) to one word, returning the
 * space-joined subword sequence (see [[TextHashKernels.bpeApply]]).
 * Designed to run over the DISTINCT-words relation so the zipfian
 * corpus pays the merge loop once per word type, not per token.
 */
/**
 * `wordpiece_apply(word, vocab)` → string: WordPiece greedy
 * longest-match segmentation of one word against a trained vocab
 * (`##`-prefixed continuations, BERT semantics; no match → `[UNK]`) —
 * [[TextHashKernels.wordpieceApply]]. Runs over the DISTINCT-words
 * relation like `bpe_apply`.
 */
case class WordPieceApplyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_apply requires (string, array<string>), got $other")
  }

  override def nullSafeEval(word: Any, vocab: Any): Any =
    TextHashKernels.wordpieceApply(
      word.asInstanceOf[UTF8String], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, v) => s"graft.functions.TextHashKernels.wordpieceApply($w, $v)")

  override def prettyName: String = "wordpiece_apply"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `jaro_winkler(a, b)` → double: byte-level Jaro–Winkler similarity
  * with DuckDB's conventions (m = 0 → 0, boost iff jaro > 0.7,
  * prefix cap 4) — [[TextHashKernels.jaroWinkler]]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHashKernels.jaroWinkler($a, $b)")

  override def prettyName: String = "jaro_winkler"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `phrase_count(text, phrase)` → count of consecutive-token matches
  * of `phrase` (array<string>) in the whitespace tokenization of
  * `text`, overlaps included — [[TextHashKernels.phraseCount]]. */
case class PhraseCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_count requires (string, array<string>), got $other")
  }

  override def nullSafeEval(text: Any, phrase: Any): Any =
    TextHashKernels.phraseCount(
      text.asInstanceOf[UTF8String], phrase.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.TextHashKernels.phraseCount($t, $p)")

  override def prettyName: String = "phrase_count"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `ngram_overlap_counts(pred, gold, maxN, charLevel)` → array<bigint>
 * of 3·maxN clipped n-gram overlap counts `[overlap_n, total_pred_n,
 * total_gold_n]` for n = 1..maxN — the scan-local core of the
 * generation-eval metrics (BLEU, chrF, ROUGE-n, token-F1); see
 * [[TextHashKernels.ngramOverlapCounts]] for the unit semantics and
 * why this is a kernel, not an explode + join.
 *
 * NOT null-safe by design: a NULL side contributes zero units on that
 * side while the other side still counts (the pre-kernel plans
 * filtered NULLs per side before exploding), so `eval`/codegen handle
 * nulls themselves and the output is never null.
 */
case class NgramOverlapCountsExpr(
    left: Expression, right: Expression, maxN: Int, charLevel: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if maxN >= 1 && maxN <= 8 =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"ngram_overlap_counts maxN must be in [1, 8], got $maxN")
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_overlap_counts requires (string, string), got $other")
    }

  override def eval(input: InternalRow): Any =
    TextHashKernels.ngramOverlapCounts(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String],
      maxN, charLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = left.genCode(ctx)
    val g = right.genCode(ctx)
    val pv =
      if (left.nullable) s"(${p.isNull} ? null : ${p.value})" else s"${p.value}"
    val gv =
      if (right.nullable) s"(${g.isNull} ? null : ${g.value})" else s"${g.value}"
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = p.code + g.code +
        code"""
          final $arrCls ${ev.value} =
            graft.functions.TextHashKernels.ngramOverlapCounts(
              $pv, $gv, $maxN, $charLevel);
        """,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "ngram_overlap_counts"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `deletion_neighborhood_hashes(text)` → array<bigint>: FNV-1a hashes
 * of the string plus every single-code-point-deletion variant, deduped
 * and sorted — the FastSS/SymSpell blocking signature set, complete
 * for Levenshtein τ = 1 (see
 * [[TextHashKernels.deletionNeighborhoodHashes]]). NULL → NULL.
 */
case class DeletionNeighborhoodHashesExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deletion_neighborhood_hashes requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.deletionNeighborhoodHashes(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.deletionNeighborhoodHashes($c)")

  override def prettyName: String = "deletion_neighborhood_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `adjacent_token_pairs(text, minLen)` → array<struct<src,dst>>:
 * bidirectional adjacent-token co-occurrence pairs with a code-point
 * length floor (see [[TextHashKernels.adjacentTokenPairs]]).
 * NULL → NULL.
 */
case class AdjacentTokenPairsExpr(child: Expression, minLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("dst", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if minLen >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"adjacent_token_pairs minLen must be >= 1, got $minLen")
    case other => TypeCheckResult.TypeCheckFailure(
      s"adjacent_token_pairs requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.adjacentTokenPairs(v.asInstanceOf[UTF8String], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.adjacentTokenPairs($c, $minLen)")

  override def prettyName: String = "adjacent_token_pairs"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `hashed_ngram_buckets(text, buckets)` → array<int>: md5-nibble DSIR
 * feature buckets of every unigram + adjacent bigram (see
 * [[TextHashKernels.hashedNgramBuckets]]). NULL → NULL.
 */
case class HashedNgramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if buckets > 0 && buckets <= 65536 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets buckets must be in [1, 65536], got $buckets")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.hashedNgramBuckets(v.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.hashedNgramBuckets($c, $buckets)")

  override def prettyName: String = "hashed_ngram_buckets"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `edit_distance(a, b, unit)` → bigint: Levenshtein distance over one
 * of three unit alphabets — 'byte' (DuckDB/ClickHouse `levenshtein`
 * parity), 'codepoint' (Spark builtin parity), 'token' (single-space
 * fields — word error rate's unit). See
 * [[TextHashKernels.editDistance]]. NULL on either side → NULL (the
 * SQL `levenshtein` convention).
 */
case class EditDistanceExpr(left: Expression, right: Expression, unit: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType)
          if unit >= TextHashKernels.UnitByte && unit <= TextHashKernels.UnitToken =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"edit_distance unit must be 0 (byte), 1 (codepoint) or 2 (token), got $unit")
      case other => TypeCheckResult.TypeCheckFailure(
        s"edit_distance requires (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.editDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], unit)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashKernels.editDistance($a, $b, $unit)")

  override def prettyName: String = "edit_distance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `damerau_distance(a, b)` → bigint: TRUE Damerau–Levenshtein
 * distance over UTF-8 bytes — DuckDB `damerau_levenshtein` parity
 * (see [[TextHashKernels.damerauDistance]]; inputs capped at 512
 * bytes per side). NULL on either side → NULL.
 */
case class DamerauDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"damerau_distance requires (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.damerauDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashKernels.damerauDistance($a, $b)")

  override def prettyName: String = "damerau_distance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class BpeApplyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires (string, array<string>), got $other")
  }

  override def nullSafeEval(word: Any, merges: Any): Any =
    TextHashKernels.bpeApply(word.asInstanceOf[UTF8String], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) => s"graft.functions.TextHashKernels.bpeApply($w, $m)")

  override def prettyName: String = "bpe_apply"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `ngram_strings(text, n)` → array<string>: all order-n token n-grams
 * of a single-space-tokenized string, space-joined, in position order
 * (see [[TextHashKernels.ngramStrings]]) — the codegen replacement for
 * the `explode(transform(sequence(...), ...))` CodegenFallback
 * pipeline in distinct-n. NULL → NULL.
 */
case class NgramStringsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && n <= 8 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"ngram_strings n must be in [1, 8], got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_strings requires string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashKernels.ngramStrings(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.ngramStrings($c, $n)")

  override def prettyName: String = "ngram_strings"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `mlm_mask(id, text, oneIn)` → struct<n_tokens:bigint, n_masked:
 * bigint, input_text:string, target_text:string>: one-pass masked-LM
 * corruption with md5(id:pos)-seeded mask positions (see
 * [[TextHashKernels.mlmMask]]) — the codegen replacement for the
 * three-HOF (`transform`/`zip_with`/`aggregate`) CodegenFallback tree.
 * Never NULL as a struct; NULL inputs degrade field-wise exactly as
 * the HOF tree does (kernel scaladoc).
 */
case class MlmMaskExpr(left: Expression, right: Expression, oneIn: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("n_masked", LongType, nullable = true),
    StructField("input_text", StringType, nullable = false),
    StructField("target_text", StringType, nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if oneIn >= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"mlm_mask oneIn must be >= 2, got $oneIn")
      case other => TypeCheckResult.TypeCheckFailure(
        s"mlm_mask requires (string, string), got $other")
    }

  override def eval(input: InternalRow): Any =
    TextHashKernels.mlmMask(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String],
      oneIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idc = left.genCode(ctx)
    val txt = right.genCode(ctx)
    val iv =
      if (left.nullable) s"(${idc.isNull} ? null : ${idc.value})"
      else s"${idc.value}"
    val tv =
      if (right.nullable) s"(${txt.isNull} ? null : ${txt.value})"
      else s"${txt.value}"
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = idc.code + txt.code +
        code"""
          final $rowCls ${ev.value} =
            graft.functions.TextHashKernels.mlmMask($iv, $tv, $oneIn);
        """,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "mlm_mask"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
