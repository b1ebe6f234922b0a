package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * custom Catalyst expressions (e.g. graft.functions.CosineSimilarity)
  * through the public Column API. This is the standard extension-point
  * gap in Spark 4's Column/ColumnNode split; no Spark internals are
  * modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
