package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters,
  * so graft's native Catalyst expressions (graft.functions.VectorExprs)
  * can be used as ordinary Columns. Lives under org.apache.spark.sql
  * purely for access; contains no Spark-internal logic of its own.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL-callable function built from raw Catalyst expressions
    * on an ALREADY-RUNNING session (the extensions config route in
    * graft.GraftExtensions only applies at session build time). */
  def registerFunction(spark: org.apache.spark.sql.classic.SparkSession,
                       name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
