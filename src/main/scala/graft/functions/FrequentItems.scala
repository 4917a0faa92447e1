package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
 * per Agarwal et al., "Mergeable Summaries", PODS 2012): at most
 * `capacity` (item, counter) pairs, with the invariant that every
 * item's counter undercounts its true frequency by at most
 * N / (capacity + 1). The load-bearing guarantee for two-pass exact
 * heavy hitters: ANY item with true count > N / (capacity + 1) is
 * present in the summary, so a second exact-count pass over just the
 * summary's candidates misses nothing.
 */
final class MgBuffer(val capacity: Int) extends Serializable {
  val counts = new java.util.HashMap[UTF8String, Array[Long]](capacity * 2)

  def add(item: UTF8String, w: Long): Unit = {
    val c = counts.get(item)
    if (c != null) c(0) += w
    else {
      counts.put(item.clone(), Array(w))
      if (counts.size() > capacity) compress()
    }
  }

  /** Drop to ≤ capacity entries by subtracting the (capacity+1)-th
    * largest counter from all (the mergeable-summaries compress). */
  def compress(): Unit = {
    if (counts.size() <= capacity) return
    val vals = new Array[Long](counts.size())
    val it = counts.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next()(0); i += 1 }
    java.util.Arrays.sort(vals)
    val d = vals(vals.length - capacity - 1) // (capacity+1)-th largest
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      e.getValue()(0) -= d
      if (e.getValue()(0) <= 0) eit.remove()
    }
  }
}

/**
 * `frequent_items_sketch(tokens, capacity)` — aggregate an
 * array<string> column into a Misra–Gries summary:
 * array<struct<item string, cnt bigint>>, ordered (cnt DESC, item
 * ASC), cnt a LOWER bound undercounting by ≤ N/(capacity+1).
 *
 * The scale story: a full `groupBy(token)` shuffles every distinct
 * token; this buffer is bounded at `capacity` entries per partial, so
 * the exchange carries at most `capacity` pairs per task regardless
 * of corpus size — candidates for the exact second pass of
 * [[graft.operators.HeavyHitters]], which restores exactness.
 */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(capacity >= 1 && capacity <= 100000,
    s"frequent_items_sketch capacity must be in [1, 100000], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent_items_sketch expects array<string>, got ${other.sql}")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) buf.add(a.getUTF8String(i), 1L)
        i += 1
      }
    }
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = a.counts.get(e.getKey)
      if (c != null) c(0) += e.getValue()(0)
      else a.counts.put(e.getKey, Array(e.getValue()(0)))
    }
    a.compress()
    a
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counts.size())
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    // deterministic output: (cnt DESC, item ASC)
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt))
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    var bytes = 8
    val it0 = buf.counts.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().numBytes()
    val bb = java.nio.ByteBuffer.allocate(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.capacity)
    bb.putInt(buf.counts.size())
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue()(0))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val buf = new MgBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      val cnt = bb.getLong
      buf.counts.put(UTF8String.fromBytes(kb), Array(cnt))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "frequent_items_sketch"
}
