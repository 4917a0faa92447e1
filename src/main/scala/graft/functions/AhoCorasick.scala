package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern matching (Aho & Corasick 1975) — the
 * blocklist/taxonomy scanner of corpus governance: matching THOUSANDS
 * of phrases (toxic terms, licensed lyrics fragments, PII trigger
 * phrases, product names) against every document in ONE text pass.
 * The alternatives fail at scale: a regex alternation of 10k phrases
 * is quadratic-ish in the engine's NFA, and 10k `contains` calls scan
 * the text 10k times; the AC automaton scans once, O(text + matches),
 * independent of pattern count.
 *
 * The automaton is built ONCE on the driver (goto/fail/output arrays,
 * the textbook BFS construction), broadcast to executors, and probed
 * from a codegen'd expression — the same handle-not-payload shipping
 * discipline as the broadcast Bloom filter: a 10k-phrase automaton is
 * megabytes, which must never ride per-stage task binaries.
 *
 * Match semantics: every (pattern, end position) pair counts — the
 * standard AC output, substring matches included ("scan" fires inside
 * "slow scan" if both are patterns). Counting is deterministic and
 * SQL-replayable per pattern for borderless patterns.
 */
object AhoCorasick {

  /** Flattened automaton: dense-ish child maps per node plus fail and
    * per-node pattern-id output lists. Serializable (broadcast). */
  final class Automaton(
      val children: Array[Map[Char, Int]],
      val fail: Array[Int],
      val out: Array[Array[Int]],
      val nPatterns: Int) extends Serializable

  /** Textbook build: trie, then BFS fail links with output merging. */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          outs += scala.collection.mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      outs(node) += pid
    }
    val n = children.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        outs(v) ++= outs(fail(v))
        queue += v
      }
    }
    new Automaton(children.map(_.toMap).toArray, fail,
      outs.map(_.toArray).toArray, patterns.length)
  }

  /** Codegen entry point: `Object`-typed so the generated Java never
    * names the Scala-nested Automaton class (Janino resolves nested
    * types by their `$` binary name, not the source name). */
  def scanCountsAny(a: Object, text: UTF8String): Array[Long] =
    scanCounts(a.asInstanceOf[Automaton], text)

  /** One pass over `text`: (total match count, distinct patterns hit).
    * Called from codegen per row. */
  def scanCounts(a: Automaton, text: UTF8String): Array[Long] = {
    if (text == null) return Array(0L, 0L)
    val s = text.toString
    var node = 0
    var total = 0L
    val seen = new Array[Boolean](a.nPatterns)
    var distinct = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      while (node != 0 && !a.children(node).contains(c)) node = a.fail(node)
      node = a.children(node).getOrElse(c, 0)
      val hits = a.out(node)
      var k = 0
      while (k < hits.length) {
        total += 1
        if (!seen(hits(k))) { seen(hits(k)) = true; distinct += 1 }
        k += 1
      }
      i += 1
    }
    Array(total, distinct)
  }
}

/** Driver-side registry of broadcast automatons — the same
  * tag-through-the-function-registry bridge as
  * [[BloomBroadcastRegistry]]: plans carry a ~100-byte broadcast
  * handle, executors fetch the automaton once. */
object AcRegistry {
  private val tags = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.broadcast.Broadcast[AhoCorasick.Automaton]]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  def register(bc: org.apache.spark.broadcast.Broadcast[
    AhoCorasick.Automaton]): String = {
    val tag = s"ac-bc-${ctr.incrementAndGet()}"
    tags.put(tag, bc)
    tag
  }

  def lookup(tag: String): org.apache.spark.broadcast.Broadcast[
    AhoCorasick.Automaton] = {
    val bc = tags.get(tag)
    require(bc != null, s"unknown Aho-Corasick broadcast tag: $tag")
    bc
  }

  def deregister(tag: String): Unit = tags.remove(tag)
}

/**
 * `ac_scan(tag, text)` → struct(total_matches, distinct_patterns):
 * one automaton pass per row inside WholeStageCodegen; the automaton
 * rides a broadcast, never the task binary.
 */
case class AcScanExpr(
    bc: org.apache.spark.broadcast.Broadcast[AhoCorasick.Automaton],
    child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("total_matches", LongType, nullable = false),
    StructField("distinct_patterns", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac_scan expects a string, got ${other.sql}")
  }

  override protected def nullSafeEval(text: Any): Any = {
    val r = AhoCorasick.scanCounts(bc.value, text.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(r(0), r(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftAcBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val autoVar = ctx.addMutableState("Object", "graftAcAuto",
      v => s"$v = $bcRef.value();")
    nullSafeCodeGen(ctx, ev, t =>
      s"""long[] graftAcR = graft.functions.AhoCorasick.scanCountsAny($autoVar, $t);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { graftAcR[0], graftAcR[1] });""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ac_scan"
}
