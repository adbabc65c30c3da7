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

  /** Executed (physical) plan rendered as a string — for plan assertions. */
  def executedPlanString(df: Dataset[Row]): String =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)

  /** DataFrame → RDD[InternalRow] (post-optimization physical output). */
  def toInternalRdd(df: Dataset[Row]): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** RDD[InternalRow] + schema → DataFrame (no conversion/copy). */
  def fromInternalRdd(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): Dataset[Row] =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
