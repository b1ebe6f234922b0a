package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable GLOBAL running total over a total order — the windowed
  * twin of [[Ids.denseId]]. The naive form
  * (`sum(v) over (order by ...)`) collapses to a single partition
  * exactly like global row_number; the reference never needs it (its
  * tables are single-node), but cumulative weights / quotas /
  * watermark ledgers at 100 TB do.
  *
  * Same two-phase shape as denseId:
  *  1. total sort (range-partitioned, stays distributed) + partition
  *     id / local index from `monotonically_increasing_id`;
  *  2. per-partition sums -> prefix offsets (a |partitions|-row window
  *     — the ONLY global window, over a tiny table) broadcast back;
  *  3. running total = partition offset + per-partition running sum
  *     (a `Window.partitionBy(__pid)` — distributed, linear per
  *     partition).
  *
  * The only full-data cost is the sort shuffle the total order already
  * requires. Sum values should be integral (long) when the result
  * feeds cross-engine comparison: long prefix sums are exact in any
  * partitioning, double ones are merge-order-dependent.
  */
object Cumsum {

  /** Append `cumCol` = running total of `value` in `sortCols` order
    * (frame = rows up to and including the current row; `sortCols`
    * must be a TOTAL order for a deterministic result). */
  def globalCumsum(df: DataFrame, sortCols: Seq[Column], value: Column,
      cumCol: String = "cum"): DataFrame = {
    // pinned for the same reason as denseId: the tagged frame feeds
    // the offset aggregation AND the final join, and
    // monotonically_increasing_id is partitioning-dependent, so the
    // two consumers must see ONE materialization
    val sorted = Materialize.pin(df.orderBy(sortCols: _*)
      .withColumn("__v", value.cast(LongType))
      .withColumn("__m", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__m"), 33).cast(LongType)))
    val offsets = sorted.groupBy("__pid")
      .agg(sum("__v").as("__psum"))
      .withColumn("__offset",
        coalesce(sum("__psum").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    sorted
      .withColumn("__lcum", sum("__v").over(
        Window.partitionBy("__pid").orderBy("__m")))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, col("__offset") + col("__lcum"))
      .drop("__v", "__m", "__pid", "__lcum", "__offset")
  }
}
