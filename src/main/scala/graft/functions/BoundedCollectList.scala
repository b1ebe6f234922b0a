package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Size-bounded `collect_list` over a BIGINT column: collects at most
  * `cap + 1` elements per group and then stops appending, so the
  * aggregation buffer is O(cap) no matter how many rows a group has.
  *
  * Why it exists (r21): the posting-list formulation of the exact
  * set-overlap join ([[graft.operators.Dedup]]) groups the (shingle →
  * doc ids) inverted index in ONE exchange, but a plain `collect_list`
  * there would build an unbounded array for exactly the stop-shingle
  * groups the `maxDf` cap exists to discard — a df=10^8 boilerplate
  * shingle is an 800 MB aggregation buffer and a task OOM at corpus
  * scale. This collector saturates at `cap + 1` elements, which is
  * both a hard memory bound AND a complete overflow signal: a group
  * whose true size is <= cap is collected exactly; a group past the
  * cap surfaces as size == cap + 1 and is dropped by the caller's
  * size filter, precisely the rows the count-then-semi-join path
  * removed with two extra exchanges of the full stream.
  *
  * Declarative (expression-only) update/merge, so it runs inside the
  * standard ObjectHashAggregate/SortAggregate machinery with partial
  * (map-side) aggregation and never introduces a ScalaUDF boundary —
  * the plan-guard Forbidden list stays clean. Update appends via
  * array concat only while size <= cap (amortized O(cap^2) element
  * copies per saturated group, 8 B elements — bounded and tiny next
  * to the shuffle it saves); merge concatenates then slices back to
  * cap + 1. Element order is partition-arrival order and NOT
  * deterministic — callers must sort or aggregate order-insensitively
  * (the dedup caller sorts, then emits unordered pairs).
  */
case class BoundedCollectLong(child: Expression, cap: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1 (got $cap)")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_long"

  private lazy val buf = AttributeReference("buf", dataType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Seq.empty[Long], dataType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(GreaterThan(Size(buf), Literal(cap)),
      buf,
      Concat(Seq(buf, CreateArray(Seq(child))))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Slice(Concat(Seq(buf.left, buf.right)), Literal(1), Literal(cap + 1)))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}

object BoundedCollectLong {
  /** Column-API entry: `boundedCollectLong(col, cap)` — complete-mode
    * aggregate with partial aggregation enabled (DeclarativeAggregate
    * supports partials natively). */
  def boundedCollectLong(c: Column, cap: Int): Column =
    GraftColumnBridge.column(AggregateExpression(
      BoundedCollectLong(GraftColumnBridge.expression(c), cap),
      Complete, isDistinct = false))
}
