package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Dense sequential surrogate-id assignment after a total sort —
  * the reference's `id = arange(nrows)+1` post-sort
  * (/root/reference/PharmacoDI/combine_pset_tables.py:346-347,
  * build_meta_tables.py:105-107).
  *
  * This is the one operation in the reference whose naive Spark
  * translation (`row_number() over (order by ...)`) collapses to a
  * single partition and cannot scale. Two implementations:
  *
  *  - [[denseIdWindow]]: `row_number` over a global `Window.orderBy`.
  *    Correct, codegen-friendly, but single-partition — only for
  *    dimension-sized tables (<~10M rows).
  *  - [[denseId]]: global sort (range-partitioned, stays distributed)
  *    followed by `rdd.zipWithIndex`, which assigns contiguous ranges
  *    per partition using only partition row-counts (one lightweight
  *    count job, no data movement). This is the 100 TB path: the only
  *    full-data cost is the sort shuffle the semantics already require.
  */
object Ids {

  /** Small-table path: global window. */
  def denseIdWindow(df: DataFrame, sortCols: Seq[Column], idCol: String = "id"): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(sortCols: _*)).cast(LongType))
      .select(idCol, df.columns.toSeq: _*)

  /** Scalable path: total sort (range-partitioned, stays distributed),
    * then dense ids from per-partition offsets — the zipWithIndex idea
    * without leaving the DataFrame world (no Row encode/decode, stays
    * in Tungsten format):
    *
    *  1. after the sort, `monotonically_increasing_id()` is
    *     (partitionId << 33) + local row index;
    *  2. one lightweight count-per-partition job yields each
    *     partition's offset (a tiny broadcast join, |partitions| rows);
    *  3. id = offset + local index + 1 — dense 1..n in sort order.
    */
  def denseId(df: DataFrame, sortCols: Seq[Column], idCol: String = "id"): DataFrame = {
    // Materialized ONCE: the id-tagged frame feeds both the offset
    // aggregation and the final join, Spark re-executes shared
    // subtrees (no ReusedExchange here — verified), and
    // monotonically_increasing_id is partitioning-dependent, so two
    // executions are only consistent while re-planning is perfectly
    // deterministic — a guarantee AQE does not make. Pinning the rows
    // also halves the work (the sort ran twice before); classic
    // rdd.zipWithIndex pins the same way by operating on one RDD.
    val sorted = Materialize.pin(df.orderBy(sortCols: _*)
      .withColumn("__m", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__m"), 33).cast(LongType))
      .withColumn("__local", col("__m").bitwiseAND((1L << 33) - 1)))
    val offsets = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum("__cnt").over(
          org.apache.spark.sql.expressions.Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    sorted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol, col("__offset") + col("__local") + 1)
      .drop("__m", "__pid", "__local", "__offset")
      .select(idCol, df.columns.toSeq: _*)
  }

  /** Non-dense but fully pipelined unique id — when density is not
    * required (documented deviation), `monotonically_increasing_id`
    * avoids even the sort.
    */
  def uniqueId(df: DataFrame, idCol: String = "id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())
}
