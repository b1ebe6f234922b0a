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

  /** Scalable path: total sort + zipWithIndex (contiguous per-partition
    * ranges => dense global 1..n in sort order).
    */
  def denseId(df: DataFrame, sortCols: Seq[Column], idCol: String = "id"): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields.toSeq)
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(withId, schema)
  }

  /** Non-dense but fully pipelined unique id — when density is not
    * required (documented deviation), `monotonically_increasing_id`
    * avoids even the sort.
    */
  def uniqueId(df: DataFrame, idCol: String = "id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())
}
