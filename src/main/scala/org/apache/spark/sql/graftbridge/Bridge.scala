package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Minimal bridge into `private[sql]` Spark internals needed by an
  * extension library: Column <-> catalyst Expression conversion and SQL
  * function registration. Lives under `org.apache.spark.sql.*` solely to
  * satisfy the `private[sql]` access qualifier — the standard technique
  * used by Spark connector/extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a catalyst-expression-backed SQL function on the session. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
