package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Mutable aggregation buffer for [[VectorAvg]]: element-wise running
 * sums in double + row count. `dim = -1` marks an empty buffer (no
 * non-null input yet); `invalid` latches a dimension mismatch, which
 * nulls the whole group's result (consistent with the scalar metrics'
 * null-on-mismatch contract).
 */
final class VectorAvgBuffer(
    var sums: Array[Double],
    var count: Long,
    var invalid: Boolean) extends Serializable {
  def dim: Int = if (sums == null) -1 else sums.length
}

/**
 * `vector_avg(vec)` — element-wise mean of a group of float vectors
 * (array<float> or the binary wire format): the centroid aggregate.
 *
 * A `TypedImperativeAggregate`: partial aggregation happens map-side
 * (each task folds its rows into one buffer of dim doubles), merge
 * combines buffers pairwise — the classic partial/final shape, so a
 * 100 TB groupBy ships only numGroups × dim doubles per task through
 * the shuffle. Double accumulation of float32 inputs keeps per-buffer
 * sums exact to the extent float64 allows; cross-partition merge order
 * can perturb the last ulps, so compare rounded (as all engine results
 * are).
 */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg requires array<float> or binary (packed float32), got ${other.sql}")
  }

  override def createAggregationBuffer(): VectorAvgBuffer =
    new VectorAvgBuffer(null, 0L, invalid = false)

  private def toArrayData(v: Any): ArrayData = child.dataType match {
    case BinaryType => VectorKernels.decodeFloatVector(v.asInstanceOf[Array[Byte]])
    case _          => v.asInstanceOf[ArrayData]
  }

  override def update(buf: VectorAvgBuffer, input: org.apache.spark.sql.catalyst.InternalRow): VectorAvgBuffer = {
    if (buf.invalid) return buf
    val v = child.eval(input)
    if (v == null) return buf // nulls ignored, like built-in avg
    val arr = toArrayData(v)
    if (arr == null) { buf.invalid = true; return buf } // malformed binary
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](n)
    else if (buf.dim != n) { buf.invalid = true; return buf }
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { buf.invalid = true; return buf }
      buf.sums(i) += arr.getFloat(i).toDouble
      i += 1
    }
    buf.count += 1
    buf
  }

  override def merge(a: VectorAvgBuffer, b: VectorAvgBuffer): VectorAvgBuffer = {
    if (a.invalid || b.invalid) { a.invalid = true; return a }
    if (b.sums == null) return a
    if (a.sums == null) { a.sums = b.sums; a.count = b.count; return a }
    if (a.dim != b.dim) { a.invalid = true; return a }
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def eval(buf: VectorAvgBuffer): Any = {
    if (buf.invalid || buf.sums == null || buf.count == 0L) return null
    val out = new Array[Double](buf.sums.length)
    var i = 0
    while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: VectorAvgBuffer): Array[Byte] = {
    val dim = buf.dim
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 1 + math.max(dim, 0) * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(dim)
    bb.putLong(buf.count)
    bb.put(if (buf.invalid) 1.toByte else 0.toByte)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dim = bb.getInt
    val count = bb.getLong
    val invalid = bb.get() == 1.toByte
    val sums = if (dim < 0) null else {
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim) { a(i) = bb.getDouble; i += 1 }
      a
    }
    new VectorAvgBuffer(sums, count, invalid)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_avg"
}

/** Buffer for [[GramMatrix]]: upper-triangle micro-unit sums + count.
  * `dim = -1` marks empty; `invalid` latches a dimension mismatch. */
final class GramMatrixBuffer(
    var dim: Int,
    var sums: Array[Long],
    var count: Long,
    var invalid: Boolean) extends Serializable

/**
 * `vector_gram(vec)` — the corpus second-moment (uncentered covariance)
 * matrix of a group of float vectors, as `struct<n: bigint,
 * sums: array<bigint>>`: row count plus the upper triangle (row-major,
 * i ≤ j) of Σ round(vᵢ·vⱼ, 6), accumulated EXACTLY in 10⁻⁶ units
 * (longs), so the result is independent of partitioning and merge
 * order — the same determinism scheme as
 * [[graft.operators.TextAnalysis.tokenLogFreqScore]]. float32 products
 * are exact in float64 (24-bit mantissas), so the only rounding is the
 * deliberate 6-dp one.
 *
 * This is THE one-pass input to PCA/whitening
 * ([[graft.operators.Pca]]): a 100 TB corpus reduces map-side to one
 * dim(dim+1)/2-long buffer per task (64 dims → 2 080 longs ≈ 16 KB),
 * merged pairwise — only numGroups × 16 KB ever crosses the shuffle,
 * and the driver sees a single 64×64 matrix.
 */
case class GramMatrix(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramMatrixBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_gram requires array<float>, got ${other.sql}")
  }

  override def createAggregationBuffer(): GramMatrixBuffer =
    new GramMatrixBuffer(-1, null, 0L, invalid = false)

  /** Half-away-from-zero at 6 dp in micro-units — the semantics of SQL
    * `round(x, 6)` in both Spark and DuckDB, so oracles can replay the
    * accumulation exactly. */
  @inline private def micro(x: Double): Long =
    if (x >= 0) math.floor(x * 1e6 + 0.5d).toLong
    else math.ceil(x * 1e6 - 0.5d).toLong

  override def update(buf: GramMatrixBuffer, input: org.apache.spark.sql.catalyst.InternalRow): GramMatrixBuffer = {
    if (buf.invalid) return buf
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.dim == -1) {
      buf.dim = n
      buf.sums = new Array[Long](n * (n + 1) / 2)
    } else if (buf.dim != n) { buf.invalid = true; return buf }
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { buf.invalid = true; return buf }
      xs(i) = arr.getFloat(i).toDouble
      i += 1
    }
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        buf.sums(k) += micro(xs(i) * xs(j))
        k += 1
        j += 1
      }
      i += 1
    }
    buf.count += 1
    buf
  }

  override def merge(a: GramMatrixBuffer, b: GramMatrixBuffer): GramMatrixBuffer = {
    if (a.invalid || b.invalid) { a.invalid = true; return a }
    if (b.sums == null) return a
    if (a.sums == null) { a.dim = b.dim; a.sums = b.sums; a.count = b.count; return a }
    if (a.dim != b.dim) { a.invalid = true; return a }
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def eval(buf: GramMatrixBuffer): Any = {
    if (buf.invalid || buf.sums == null || buf.count == 0L) return null
    org.apache.spark.sql.catalyst.InternalRow(
      buf.count, UnsafeArrayData.fromPrimitiveArray(buf.sums))
  }

  override def serialize(buf: GramMatrixBuffer): Array[Byte] = {
    val len = if (buf.sums == null) 0 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 1 + len * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.dim)
    bb.putInt(len)
    bb.putLong(buf.count)
    bb.put(if (buf.invalid) 1.toByte else 0.toByte)
    var i = 0
    while (i < len) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramMatrixBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dim = bb.getInt
    val len = bb.getInt
    val count = bb.getLong
    val invalid = bb.get() == 1.toByte
    val sums = if (len == 0 && dim == -1) null else {
      val a = new Array[Long](len)
      var i = 0
      while (i < len) { a(i) = bb.getLong; i += 1 }
      a
    }
    new GramMatrixBuffer(dim, sums, count, invalid)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_gram"
}
