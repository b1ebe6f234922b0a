package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering (Z-order) for
  * write-time file organization. The reference has no analog (its
  * sinks are flat .jay dumps — /root/reference/PharmacoDI/
  * write_pset_table.py:34-39); at 100 TB, layout is a first-class
  * operator because parquet row-group min/max stats only skip data
  * when the writer clustered it.
  *
  * Why Z-order and not a plain sort: a lexicographic sort on (a, b)
  * clusters a perfectly and b not at all — a predicate on b alone
  * still scans every file. The Morton interleave gives every indexed
  * dimension locality proportional to its bit share, so single-column
  * predicates on ANY indexed column skip most files (spec-measured:
  * per-file spread of both dimensions shrinks vs. the unclustered
  * layout).
  *
  * Scale shape: computing the key is per-row codegen'd bit math
  * (zero shuffle); [[clusteredWrite]] adds the one range-partition
  * exchange any global clustering needs, sized by `nFiles` — at
  * 100 TB pick nFiles so files land ~1 GB, and the write parallelizes
  * across all executors with no driver involvement.
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative long columns: bit i of `x` lands at position 2i, bit
    * i of `y` at 2i+1. Pure shift/mask/add — whole-stage codegen'd,
    * and expressible identically in any engine with integer bit ops
    * (the oracle mirrors it term by term). */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31 (got $bits)")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB rendering of [[zorder2]] over column expressions. */
  def zorder2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` into `nFiles` parquet files ordered by `zcol`:
    * range-partition on the key (one exchange), sort within each
    * partition, write. Row groups then carry tight min/max for every
    * dimension folded into the key → multi-dimensional data skipping
    * on read. */
  def clusteredWrite(df: DataFrame, path: String, zcol: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(zcol))
      .sortWithinPartitions(zcol)
      .write.mode("overwrite").parquet(path)

  /** Gate query: the Z-order key over (customer, price-bucket) for
    * every order — the exact computation [[clusteredWrite]] would
    * cluster by. floor() before the cast keeps the bucket integral in
    * double space, where Spark's cast truncates but DuckDB's rounds. */
  val layoutZorder: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_custkey") % 1024).as("zx"),
        (expr("CAST(floor(o_totalprice / 1000.0) AS BIGINT)") % 1024).as("zy"))
    o.withColumn("zval", zorder2(col("zx"), col("zy"), 10))
      .orderBy("zval", "o_orderkey")
  }

  /** Write `df` as a bucketed, per-bucket-sorted parquet table: rows
    * hash-partition on `key` at write time, so any later equi-join or
    * aggregation on `key` between tables bucketed the same way needs
    * NO exchange — the join's shuffle is paid ONCE at layout time and
    * amortized over every downstream query. At 100 TB this is the
    * difference between re-shuffling the fact table per query and
    * never shuffling it again; `nBuckets` plays the role of the
    * cluster's parallelism (pick ~ total size / 1 GB).
    * LayoutSpec asserts the zero-exchange join plan. */
  def bucketedWrite(df: DataFrame, table: String, key: String,
      nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two tables bucketed on the same key. The physical plan is
    * two bucketed scans + sort-merge join — zero Exchange (asserted in
    * LayoutSpec with broadcast disabled). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Gate query: bucket-lay-out lineitem and orders on the order key,
    * join co-located, aggregate per month x returnflag. Output is
    * identical to the plain parquet join (the oracle); the LAYOUT is
    * what changes — LayoutSpec proves the join plan carries no
    * exchange. Unique table names + temp path keep reruns and
    * concurrent sessions isolated. */
  val layoutBucketedJoin: Q = (s, dir) => {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    bucketedWrite(t(s, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag"),
      s"li_$tag", "l_orderkey", 8, s"$root/li")
    bucketedWrite(t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
      s"ord_$tag", "l_orderkey", 8, s"$root/ord")
    val out = bucketedJoin(s, s"li_$tag", s"ord_$tag", "l_orderkey")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("month", "l_returnflag")
    // materialize BEFORE dropping the catalog entries the plan reads
    val rows = out.collect()
    s.sql(s"DROP TABLE IF EXISTS li_$tag")
    s.sql(s"DROP TABLE IF EXISTS ord_$tag")
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), out.schema)
  }

  val queries: Map[String, Q] = Map(
    "x_layout_zorder" -> layoutZorder,
    "x_layout_bucketed_join" -> layoutBucketedJoin)

  val oracles: Map[String, String] = Map(
    "x_layout_bucketed_join" ->
      ("SELECT date_trunc('month', o_orderdate) AS month, l_returnflag, " +
        "CAST(COUNT(*) AS BIGINT) AS n_items, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2 ORDER BY month, l_returnflag"),
    "x_layout_zorder" ->
      ("WITH o AS (SELECT o_orderkey, o_custkey % 1024 AS zx, " +
        "CAST(floor(o_totalprice / 1000.0) AS BIGINT) % 1024 AS zy FROM orders) " +
        s"SELECT o_orderkey, zx, zy, ${zorder2Sql("zx", "zy", 10)} AS zval " +
        "FROM o ORDER BY zval, o_orderkey"))
}
