package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/**
 * Z-order (Morton) interleave kernel + expression — the multi-column
 * data-layout primitive (Morton 1966; the Delta/Iceberg OPTIMIZE
 * ZORDER recipe): interleaving the bits of two clustering keys makes
 * one sort order that keeps BOTH columns' value ranges locally tight,
 * so per-file/row-group min-max stats prune 2-D box predicates that a
 * single-column sort can only prune on its leading column.
 */
object ZOrderKernels {
  /** Interleave the low `bits` bits of two non-negative longs:
    * x occupies even output positions, y odd. Inputs are masked to
    * `bits` (callers quantize/clamp first — the layout key only needs
    * rank locality, not full fidelity). */
  def zOrderKey(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/**
 * `z_order_key(x, y, bits)` → bigint: Morton interleave of the low
 * `bits` bits of two non-negative bigints (x → even bit positions,
 * y → odd). NULL if either side is NULL.
 */
case class ZOrderKeyExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if bits >= 1 && bits <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"z_order_key bits must be in [1, 31], got $bits")
      case other => TypeCheckResult.TypeCheckFailure(
        s"z_order_key requires (bigint, bigint), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.zOrderKey(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKernels.zOrderKey($a, $b, $bits)")

  override def prettyName: String = "z_order_key"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
