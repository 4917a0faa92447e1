package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `json_field_types(line)` → array<struct<key string, vtype string>>:
 * the top-level (key, type) pairs of a JSON object line, NULL for a
 * malformed line (see [[JsonKernels.jsonFieldTypes]] for the pinned
 * grammar). Interpreted path and `doGenCode` both call the static
 * kernel, so eval ≡ codegen by construction and JSONL triage stays
 * inside WholeStageCodegen — no per-row parsed tree, no UDF.
 */
case class JsonFieldTypesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("vtype", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_field_types requires a string line, got $other")
  }

  override def eval(input: InternalRow): Any =
    JsonKernels.jsonFieldTypes(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cv =
      if (child.nullable) s"(${c.isNull} ? null : ${c.value})" else s"${c.value}"
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = c.code +
      code"""
        final $arrCls ${ev.value} =
          graft.functions.JsonKernels.jsonFieldTypes($cv);
        final boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override def prettyName: String = "json_field_types"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
