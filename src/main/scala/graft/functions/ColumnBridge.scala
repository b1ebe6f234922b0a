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

  /** Release the cached blocks behind a `localCheckpoint()`ed Dataset.
    * Spark exposes no public API to free a local checkpoint (blocks
    * otherwise live until the RDD is GC'd and the ContextCleaner runs),
    * which leaks executor memory in iterative loops that checkpoint per
    * round (e.g. connected-components label propagation). The
    * checkpointed plan is a `LogicalRDD` wrapping the cached RDD —
    * unpersist that RDD directly. No-op for non-checkpointed plans. */
  def unpersistCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit =
    ds.asInstanceOf[Dataset[_]].queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
