package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the session FunctionRegistry (private[sql] in Spark 4) so
  * native expressions can be exposed to `spark.sql(...)` on an already-
  * built session; the SparkSessionExtensions path covers sessions built
  * with `spark.sql.extensions=graft.GraftExtensions`. */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
