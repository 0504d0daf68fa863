package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.{Expression, LiteralValue}
import org.apache.spark.sql.types.DataType

/** Bridge to `private[sql]` DSv2 expression internals (`LiteralValue` is not
  * accessible to external connectors in this Spark build) — same technique as
  * [[ColumnBridge]].
  */
object V2ExprBridge {
  /** (value, dataType) when the V2 expression is a literal. */
  def literal(e: Expression): Option[(Any, DataType)] = e match {
    case LiteralValue(v, t) => Some((v, t))
    case _ => None
  }
}
