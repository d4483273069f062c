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
/** Identity marked NONDETERMINISTIC: a projection pin. Alias substitution
  * and project-collapse are illegal for nondeterministic expressions, so
  * wrapping an expensive expression (a wide from_json) guarantees every
  * downstream reference reads the once-per-row attribute instead of
  * inlining a copy per consumer. Unlike the
  * `when(monotonically_increasing_id() >= 0, …)` idiom it costs nothing at
  * runtime (codegen passes the child through) and is legal in STREAMING
  * plans, where monotonically_increasing_id is rejected. */
case class Pinned(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Pinned =
    copy(child = newChild)
}

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
