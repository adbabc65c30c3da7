package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column ⇄ Expression bridge. Spark 4 made `Column` expression-agnostic
 * (columnNodeSupport.scala) and scoped the converters `private[sql]`; this
 * shim re-exports them for graft's custom Catalyst expressions
 * (graft.functions.GraftExpressions). Public Spark API only — no behavior.
 */
object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builder in the session's function registry (for SQL use). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
