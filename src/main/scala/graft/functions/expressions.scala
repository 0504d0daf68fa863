package graft.functions

import graft.core.LogDateFormat

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly epoch-millis → formatted-string expression backing
  * `format_log_date`. Equivalent of the reference's Pig `DateFormatter`
  * EvalFunc (src/com/blackberry/logdriver/pig/DateFormatter.java) but runs
  * inside whole-stage codegen instead of a per-row reflective UDF call.
  */
case class FormatLogDate(child: Expression, formatName: String, zoneId: String)
    extends UnaryExpression {

  private lazy val fmt: LogDateFormat = LogDateFormat(formatName, zoneId)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "format_log_date"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(fmt.format(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmtRef = ctx.addReferenceObj("logDateFmt", fmt, classOf[LogDateFormat].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($fmtRef.format($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): FormatLogDate =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
}

object functions {
  /** Format an epoch-millis long column with a named log-date format
    * (RFC822 | RFC822_SEC_UTC | RFC3164 | RFC5424) or a raw pattern.
    */
  def format_log_date(c: Column, format: String, zoneId: String = "UTC"): Column =
    ColumnBridge.column(FormatLogDate(ColumnBridge.expression(c), format, zoneId))
}
