package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the classic `Column(expr)` / `col.expr` constructors behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala) to keep the public `Column` API
  * connect-compatible. A library that ships native Catalyst expressions still
  * needs exactly those two conversions, so this one object lives under the
  * `org.apache.spark.sql` package to re-expose them — the standard idiom for
  * Spark-extension libraries. No other private API is touched, and nothing
  * here depends on Spark internals beyond the two stable conversion points.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into an EXISTING session's registry.
    * `SparkSessionExtensions` only applies at session construction
    * (`spark.sql.extensions` / `builder.withExtensions`); a library handed a
    * running session reaches the same registry through this bridge.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
