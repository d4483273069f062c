package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd zlib inflate: BINARY -> UTF-8 STRING. The columnar form of
  * the reference's `unpack` (util/__init__.py) over text_content/reading
  * BYTEA payloads — as an expression it keeps sibling columns (tcid,
  * reader, ...) in the row, where the earlier mapPartitions shape forced a
  * (key, bytes) tuple encoding and a join to recover them.
  */
case class InflateText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"inflate_text expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(
      graft.sources.Content.inflate(v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
        s"graft.sources.Content.inflate($c))")

  override protected def withNewChildInternal(newChild: Expression): InflateText =
    copy(child = newChild)
}
