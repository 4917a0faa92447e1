package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Catalyst expressions for the five vector-distance strategies the
 * reference exposes (reference: /root/reference/app.py:222 calls
 * `Knn::{STRATEGY}(embedding, $TargetEmbedding)`; the strategy list is
 * env.example:15-17) plus the binary float-vector codec
 * (app.py:157-162, 206-210).
 *
 * Each expression accepts `array<float>` or the binary wire format
 * (`binary`) on either side — mirroring the reference's two embedding
 * representations (`VECTOR_PASS_AS_BYTES`, app.py:63) — and returns a
 * nullable double: NULL on dimension mismatch, malformed binary payload,
 * null elements, or (for cosine) zero-norm input.
 *
 * `doGenCode` emits a call to the static [[VectorKernels]] so the
 * distance stays inside WholeStageCodegen; the interpreted `nullSafeEval`
 * path uses the identical kernel, so eval ≡ codegen by construction.
 */
abstract class VectorMetricExpression extends BinaryExpression {

  /** Static method name on [[VectorKernels]] implementing this metric
    * (used by the codegen template). */
  protected def kernelName: String

  /** The kernel itself — resolved once per expression instance, not
    * per row, so the interpreted path has no per-row dispatch cost.
    * The boolean flags are the per-side element types (float64 vs
    * float32), fixed per expression instance. */
  @transient protected lazy val kernel: (ArrayData, Boolean, ArrayData, Boolean) => java.lang.Double =
    kernelName match {
      case "cosineSimilarity"  => VectorKernels.cosineSimilarity
      case "innerProduct"      => VectorKernels.innerProduct
      case "cosineDistance"    => VectorKernels.cosineDistance
      case "euclideanDistance" => VectorKernels.euclideanDistance
      case "manhattanDistance" => VectorKernels.manhattanDistance
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isVectorType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => true
    case BinaryType               => true
    case _                        => false
  }

  /** Whether this side's ArrayData holds float64 elements (true for
    * `array<double>` inputs — PCA/whitening projections, centroid
    * tables; binary wire payloads decode to float32). */
  private def isDoubleSide(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (isVectorType(left.dataType) && isVectorType(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, array<double>, or binary " +
          s"(packed float32) arguments, got ${left.dataType.sql} and " +
          s"${right.dataType.sql}")
    }
  }

  @inline private def normalize(v: Any, dt: DataType): ArrayData = dt match {
    case BinaryType => VectorKernels.decodeFloatVector(v.asInstanceOf[Array[Byte]])
    case _          => v.asInstanceOf[ArrayData]
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = normalize(l, left.dataType)
    if (a == null) return null
    val b = normalize(r, right.dataType)
    if (b == null) return null
    kernel(a, isDoubleSide(left.dataType), b, isDoubleSide(right.dataType))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = "graft.functions.VectorKernels"
    val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("vecA")
      val b = ctx.freshName("vecB")
      val res = ctx.freshName("metric")
      val decodeL = left.dataType match {
        case BinaryType => s"$kernels.decodeFloatVector($l)"
        case _          => l
      }
      val decodeR = right.dataType match {
        case BinaryType => s"$kernels.decodeFloatVector($r)"
        case _          => r
      }
      val aD = isDoubleSide(left.dataType).toString
      val bD = isDoubleSide(right.dataType).toString
      s"""
         |$arrayCls $a = $decodeL;
         |$arrayCls $b = $decodeR;
         |java.lang.Double $res = (($a == null) || ($b == null))
         |  ? null : $kernels.$kernelName($a, $aD, $b, $bD);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })
  }
}

/** `Knn::CosineSimilarity` — app.py:222 with SEARCH_STRATEGY=CosineSimilarity. */
case class KnnCosineSimilarity(left: Expression, right: Expression)
    extends VectorMetricExpression {
  override protected def kernelName: String = "cosineSimilarity"
  override def prettyName: String = "knn_cosine_similarity"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Knn::InnerProductSimilarity` — env.example:16. */
case class KnnInnerProductSimilarity(left: Expression, right: Expression)
    extends VectorMetricExpression {
  override protected def kernelName: String = "innerProduct"
  override def prettyName: String = "knn_inner_product_similarity"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Knn::CosineDistance` — env.example:17. */
case class KnnCosineDistance(left: Expression, right: Expression)
    extends VectorMetricExpression {
  override protected def kernelName: String = "cosineDistance"
  override def prettyName: String = "knn_cosine_distance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Knn::EuclideanDistance` — env.example:17. */
case class KnnEuclideanDistance(left: Expression, right: Expression)
    extends VectorMetricExpression {
  override protected def kernelName: String = "euclideanDistance"
  override def prettyName: String = "knn_euclidean_distance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Knn::ManhattanDistance` — env.example:17. */
case class KnnManhattanDistance(left: Expression, right: Expression)
    extends VectorMetricExpression {
  override protected def kernelName: String = "manhattanDistance"
  override def prettyName: String = "knn_manhattan_distance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `to_binary_vector(array<float>) -> binary` — the client-side packing the
 * reference does in `convert_vector_to_bytes` (app.py:157-162) and the
 * server-side `Knn::ToBinaryStringFloat` (app.py:209): little-endian
 * float32 values + trailing 0x01 tag.
 */
case class ToBinaryVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_binary_vector requires array<float>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.encodeFloatVector(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("packed")
      s"""
         |byte[] $res = graft.functions.VectorKernels.encodeFloatVector($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "to_binary_vector"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `sign_bits64(array<float>) -> bigint` — 1-bit-per-dimension sign
 * quantization sketch (see [[VectorKernels.signBits64]]). Hamming distance
 * between two sketches (`bit_count(a ^ b)` — both Spark built-ins, so the
 * probe side of a sketch scan needs no custom expression at all) is the
 * binary-quantized ANN pre-filter: an 8-byte column scan instead of the
 * 256-byte vector column.
 */
case class SignBits64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bits64 requires array<float>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.signBits64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("signBits")
      s"""
         |java.lang.Long $res = graft.functions.VectorKernels.signBits64($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override def prettyName: String = "sign_bits64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `cosine_lsh_keys(vec, bitsPerTable, nTables, seed)` → array<bigint>:
 * one random-hyperplane LSH bucket key per table, table id folded into
 * the key (see [[VectorKernels.cosineLshKeys]]). The candidate-generation
 * primitive of the banded cosine similarity join — all
 * `nTables * bitsPerTable` plane projections happen in one codegen'd
 * kernel pass per row.
 */
case class CosineLshKeysExpr(child: Expression, bitsPerTable: Int, nTables: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bitsPerTable >= 1 && bitsPerTable <= 62 && nTables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_keys requires 1 <= bitsPerTable <= 62 and nTables >= 1, " +
        s"got $bitsPerTable/$nTables")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_keys requires array<float>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.cosineLshKeys(v.asInstanceOf[ArrayData], bitsPerTable, nTables, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("lshKeys")
      val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$arrayCls $res = graft.functions.VectorKernels.cosineLshKeys(
         |  $c, $bitsPerTable, $nTables, ${seed}L);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "cosine_lsh_keys"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `pq_encode(vec, codebook, m, k)` → binary (m bytes): product
 * quantization — each dim/m-component subvector becomes the index of
 * its nearest codebook centroid. See [[VectorKernels.pqEncode]].
 */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _))
        if m >= 1 && k >= 2 && k <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs m >= 1 and 2 <= k <= 256 (one byte per code), got $m/$k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires (array<float>, array<float>), got $other")
  }

  override def nullSafeEval(v: Any, cb: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val res = ctx.freshName("pqCodes")
      s"""
         |byte[] $res = graft.functions.VectorKernels.pqEncode($v, $cb, $m, $k);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "pq_encode"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `pq_adc_score(codes, lut, k)` → double: asymmetric-distance score of
 * a PQ code against a per-query lookup table. See
 * [[VectorKernels.pqAdcScore]].
 */
/**
 * `mat_vec(vec, flatMatrix, offsets)` → array<double>: dense linear map
 * out(k) = ⟨vec, row_k⟩ − offsets(k), with the d×dim matrix flattened
 * row-major into a plan-literal array (see [[VectorKernels.matVec]]).
 * The codegen'd projection kernel for PCA/whitening/random projections —
 * deliberately NOT built from `zip_with`/`aggregate`, which are
 * `CodegenFallback` and evaluate interpreted.
 */
case class MatVecExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mat_vec requires (array<float>, array<double>, array<double>), got $other")
    }

  override def nullSafeEval(vec: Any, flat: Any, offs: Any): Any =
    VectorKernels.matVec(vec.asInstanceOf[ArrayData],
      flat.asInstanceOf[ArrayData], offs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, o) => {
      val res = ctx.freshName("matVec")
      val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$arrayCls $res = graft.functions.VectorKernels.matVec($v, $m, $o);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "mat_vec"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * `nearest_centroid(qv, flat)` → array<long> `[cid, dist2]`: exact
 * integer-L2² argmin over k row-major micro-unit centroids (see
 * [[VectorKernels.nearestCentroidL2]]) — the Lloyd's-assignment step of
 * [[graft.operators.KMeansExact]], bit-reproducible by construction.
 */
case class NearestCentroidExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (array<bigint>, array<bigint>), got $other")
  }

  override def nullSafeEval(qv: Any, flat: Any): Any =
    VectorKernels.nearestCentroidL2(
      qv.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, f) => {
      val res = ctx.freshName("nearestCentroid")
      val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$arrayCls $res = graft.functions.VectorKernels.nearestCentroidL2($q, $f);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PqAdcScoreExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) if k >= 2 && k <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score requires (binary, array<double>) and 2 <= k <= 256, got $other / $k")
  }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    VectorKernels.pqAdcScore(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val res = ctx.freshName("adc")
      s"""
         |java.lang.Double $res = graft.functions.VectorKernels.pqAdcScore($c, $l, $k);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "pq_adc_score"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `from_binary_vector(binary) -> array<float>` — inverse of
 * [[ToBinaryVector]] (format defined at app.py:160-161). NULL on
 * malformed payload.
 */
case class FromBinaryVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"from_binary_vector requires binary, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.decodeFloatVector(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("decoded")
      val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$arrayCls $res = graft.functions.VectorKernels.decodeFloatVector($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "from_binary_vector"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `vector_normalize(vec) -> array<double>` — L2-normalize to unit
 * length (double precision, sequential accumulation). Accepts
 * `array<float>` or the packed binary wire format. NULL on empty,
 * null-element, zero-norm, or malformed input.
 *
 * The ingest-side half of the cosine fast path: over a unit-norm
 * store, `knn_inner_product_similarity` ≡ `knn_cosine_similarity`,
 * removing both norm loops from every scanned row.
 */
case class VectorNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_normalize requires array<float> or binary (packed float32), got ${other.sql}")
  }

  private def isBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(v: Any): Any = {
    val arr =
      if (isBinary) VectorKernels.decodeFloatVector(v.asInstanceOf[Array[Byte]])
      else v.asInstanceOf[ArrayData]
    VectorKernels.normalizeVector(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("normalized")
      val arrayCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      val input =
        if (isBinary) s"graft.functions.VectorKernels.decodeFloatVector($c)" else c
      s"""
         |$arrayCls $res = graft.functions.VectorKernels.normalizeVector($input);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "vector_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `sq8_encode(vec, mins, deltas)` → binary: per-dimension affine 8-bit
 * scalar quantization (faiss SQ8 layout). See [[VectorKernels.sq8Encode]].
 */
case class Sq8EncodeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_encode requires (array<float>, array<double>, array<double>), got $other")
    }

  override def nullSafeEval(vec: Any, mins: Any, deltas: Any): Any =
    VectorKernels.sq8Encode(vec.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], deltas.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, dl) => {
      val res = ctx.freshName("sqCodes")
      s"""
         |byte[] $res = graft.functions.VectorKernels.sq8Encode($v, $lo, $dl);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "sq8_encode"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * `sq8_cos_score(codes, flat)` → double: reconstructed-cosine score of
 * an SQ8 code against the per-query coefficient table
 * [biasDot, biasN] ++ w ++ a ++ b. See [[VectorKernels.sq8CosScore]].
 */
case class Sq8CosScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_cos_score requires (binary, array<double>), got $other")
  }

  override def nullSafeEval(codes: Any, flat: Any): Any =
    VectorKernels.sq8CosScore(codes.asInstanceOf[Array[Byte]], flat.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, f) => {
      val res = ctx.freshName("sqScore")
      s"""
         |java.lang.Double $res = graft.functions.VectorKernels.sq8CosScore($c, $f);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "sq8_cos_score"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
