package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k buffer: parallel arrays sorted best-first under
 * (score DESC, id ASC). k is small (validated ≤ 1024), so shifting
 * inserts beat heap bookkeeping and the buffer serializes flat.
 */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    val last = math.min(n, k - 1)
    var i = last
    while (i > pos) { scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1 }
    scores(pos) = score
    ids(pos) = id
    if (n < k) n += 1
  }
}

/**
 * `topk_by_score(score, id, k)` — per-group top-k rows by
 * (score DESC, id ASC), as an ordered array<struct<score,id>>.
 *
 * The scale-right alternative to `row_number() OVER (PARTITION BY g
 * ORDER BY s) <= k`: the window form shuffles and sorts EVERY row of
 * every group; this aggregate keeps a k-slot buffer per group map-side,
 * so the exchange carries at most k (score, id) pairs per group per
 * task and no sort ever materializes. At 100 TB the difference is the
 * whole fact table through the shuffle vs. k rows per group.
 *
 * The deterministic id tie-break is part of the contract (same rule as
 * every engine ordering); null scores/ids are skipped like built-in
 * aggregates skip null input.
 */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1 && k <= 1024, s"topk_by_score k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got (${s.sql}, ${i.sql})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.n * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.k)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bufK = bb.getInt
    val n = bb.getInt
    val buf = new TopKBuffer(bufK)
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble
      buf.ids(i) = bb.getLong
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
