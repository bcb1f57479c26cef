package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column ↔ Expression converters.
 * Spark 4 wraps Columns around ColumnNodes and gates the classic
 * Expression constructors behind package-private API; third-party
 * Catalyst extensions conventionally reach them from an
 * `org.apache.spark.sql` subpackage (same pattern as spark-packages
 * connectors). Used only by graft.functions to expose native expressions
 * as Columns.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
