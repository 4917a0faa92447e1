package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/**
 * Engine-owned Bloom filter for semi-join pruning (runtime row filters):
 * build a compact bit-set over the small side's join keys, broadcast it
 * as a literal into a codegen'd probe on the large side, and let the
 * exact join remove the false positives — the result is bit-identical
 * to the plain join, but only the ~matching fraction of the fact table
 * reaches the shuffle.
 *
 * The filter is self-describing bytes: [numHashes: int32 LE]
 * [numBits: int64 LE][bit array, LSB-first within each byte]. Probes
 * use Kirsch–Mitzenmacher double hashing over one 64-bit key hash
 * (callers feed `xxhash64(key)` from Spark's built-in, so any key type
 * works and build/probe agree): position_i = (h1 + i·h2) mod numBits
 * with h2 forced odd so strides cover the table.
 *
 * Public-construction provenance: standard Bloom filter math
 * (Bloom 1970; double hashing per Kirsch–Mitzenmacher 2006), same
 * role as the `runtimeFilter` the reference's remote engine applies
 * internally — the reference itself has no join surface at all
 * (SURVEY.md §2.2).
 */
object BloomKernels {
  final val HeaderBytes = 12

  /** m = -n·ln(p) / ln(2)², clamped to [64, 2^31) bits. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // strict upper bound: create() requires numBits < Int.MaxValue
    math.min(math.max(m, 64L), Int.MaxValue.toLong - 8)
  }

  /** k = round(m/n · ln 2), at least 1. */
  def optimalNumHashes(expectedItems: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  def create(numBits: Long, numHashes: Int): Array[Byte] = {
    require(numBits >= 1 && numBits < Int.MaxValue.toLong, s"numBits out of range: $numBits")
    require(numHashes >= 1 && numHashes <= 32, s"numHashes out of range: $numHashes")
    val bytes = new Array[Byte](HeaderBytes + ((numBits + 7) / 8).toInt)
    writeIntLE(bytes, 0, numHashes)
    writeLongLE(bytes, 4, numBits)
    bytes
  }

  private def writeIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }
  private def writeLongLE(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }
  private def readIntLE(b: Array[Byte], off: Int): Int = {
    var v = 0; var i = 0
    while (i < 4) { v |= (b(off + i) & 0xFF) << (8 * i); i += 1 }
    v
  }
  private def readLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(off + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  /** SplitMix64 finalizer — derives the second hash stream from the first. */
  private def remix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def put(filter: Array[Byte], hash: Long): Unit = {
    val numHashes = readIntLE(filter, 0)
    val numBits = readLongLE(filter, 4)
    val h2 = remix(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((hash + i * h2) & Long.MaxValue) % numBits
      val idx = HeaderBytes + (pos >>> 3).toInt
      filter(idx) = (filter(idx) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** The probe — called from codegen per fact row; O(numHashes) byte reads. */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    val numHashes = readIntLE(filter, 0)
    val numBits = readLongLE(filter, 4)
    val h2 = remix(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((hash + i * h2) & Long.MaxValue) % numBits
      if ((filter(HeaderBytes + (pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** In-place OR of b into a; filters must share dimensions. */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length && readIntLE(a, 0) == readIntLE(b, 0),
      "cannot merge Bloom filters with different parameters")
    var i = HeaderBytes
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/**
 * `bloom_build(keyHash, numBits, numHashes)` — aggregates 64-bit key
 * hashes into a serialized Bloom filter (binary). Partial buffers are
 * built map-side and OR-merged — the shuffle carries numBits/8 bytes
 * per task, never the keys. Null hashes are skipped like built-in
 * aggregates skip null input.
 */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects a bigint key hash (use xxhash64(key)), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    BloomKernels.create(numBits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.put(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomKernels.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_build"
}

/**
 * Driver-side registry of broadcast Bloom filters. The function
 * registry's plan builders only accept Expressions, so a Broadcast
 * handle cannot ride the SQL surface directly; instead the caller
 * broadcasts the filter bytes, registers the handle here, and passes
 * the returned TAG as a string literal — the builder resolves the tag
 * back to the handle at PLAN time (driver-side). The task binary then
 * carries a ~100-byte broadcast reference instead of the filter
 * bytes: executors fetch the blob ONCE via the broadcast manager
 * rather than per-stage inside every task closure (a 240 KB filter as
 * a plan literal was re-serializing into each of the join's stages —
 * the "large task binary" class; at 1000 executors × many stages that
 * is real driver egress).
 */
object BloomBroadcastRegistry {
  private val tags = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.broadcast.Broadcast[Array[Byte]]]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  def register(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): String = {
    val tag = s"bloom-bc-${ctr.incrementAndGet()}"
    tags.put(tag, bc)
    tag
  }

  def lookup(tag: String): org.apache.spark.broadcast.Broadcast[Array[Byte]] = {
    val bc = tags.get(tag)
    require(bc != null, s"unknown bloom broadcast tag: $tag")
    bc
  }

  /** Drop a tag (the Broadcast itself is the caller's to destroy). */
  def deregister(tag: String): Unit = tags.remove(tag)
}

/**
 * `bloom_probe_broadcast(tag, keyHash)` resolves to this: the probe of
 * [[BloomMightContainExpr]] with the filter held as a BROADCAST handle
 * instead of a plan literal. Codegen caches `bc.value()` in a mutable
 * state slot, so per row it is the same O(numHashes) byte reads — the
 * only difference is where the bytes live (broadcast block manager,
 * fetched once per executor, vs inline in every task binary).
 */
case class BloomMightContainBroadcast(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe_broadcast expects a bigint key hash, got ${other.sql}")
  }

  override protected def nullSafeEval(hash: Any): Any =
    BloomKernels.mightContain(bc.value, hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val filterVar = ctx.addMutableState("byte[]", "graftBloomBytes",
      v => s"$v = (byte[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomKernels.mightContain($filterVar, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_probe_broadcast"
}

/**
 * `bloom_might_contain(filter, keyHash)` — true iff the key MAY be in
 * the filter (no false negatives). Codegen'd: the generated code calls
 * the static kernel probe, so the filter (typically a literal — one
 * broadcast reference object per task) costs O(numHashes) byte reads
 * per row inside WholeStageCodegen. For filters past ~100 KB prefer
 * the broadcast form ([[BloomMightContainBroadcast]] via
 * `bloom_probe_broadcast`): a large literal re-serializes into every
 * stage's task binary.
 */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(filter: Any, hash: Any): Any =
    BloomKernels.mightContain(filter.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, h) =>
      s"${ev.value} = graft.functions.BloomKernels.mightContain($f, $h);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
