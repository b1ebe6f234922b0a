package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality validation and dataset profiling — the "check the
  * table before you train on it" step (the capability Deequ/Great
  * Expectations provide), expressed as ONE aggregation pass per table
  * so the 100 TB scan happens exactly once regardless of how many
  * constraints are declared.
  *
  * Reference analogue: the ad-hoc assertion scatter in the reference's
  * build scripts (row-count echoes and FK audits,
  * PharmacoDI/combine_pset_tables.py:319-326) — here consolidated
  * into a declarative check list with a machine-checkable verdict per
  * constraint, the shape a pipeline gate can actually consume.
  *
  * Scale shape: every check metric is an aggregate expression, so all
  * of them ride one map-side-combined Aggregate over a single scan;
  * the result is ONE row that explodes into check-sized output.
  * `count(distinct)` metrics make Spark plan the expand+two-phase
  * distinct aggregation — still one scan of the input. Nothing here
  * depends on row order or float summation: all metrics are exact
  * integer counts, so the verdict is bit-identical on any cluster.
  */
object Profile {

  type Q = (SparkSession, String) => DataFrame

  /** One declared constraint: a name, an aggregate violation metric
    * (counts of offending rows, or a derived exact integer), and the
    * pass predicate over that metric. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Standard constraint constructors (violation-count style: metric 0
    * = clean, so `pass` is `metric === 0` unless stated). */
  object Check {
    /** Column has no nulls. */
    def complete(c: String): Check =
      Check(s"complete_$c", count(lit(1)) - count(col(c)), _ === 0L)

    /** Column values are unique (a candidate key). */
    def unique(c: String): Check =
      Check(s"unique_$c", count(lit(1)) - countDistinct(col(c)), _ === 0L)

    /** No value below `lo` (null passes — pair with [[complete]]). */
    def atLeast(c: String, lo: Double): Check =
      Check(s"min_${c}", sum(when(col(c) < lo, 1L).otherwise(0L)), _ === 0L)

    /** No value above `hi`. */
    def atMost(c: String, hi: Double): Check =
      Check(s"max_${c}", sum(when(col(c) > hi, 1L).otherwise(0L)), _ === 0L)

    /** Every non-null value drawn from the allowed set. */
    def inSet(c: String, allowed: Seq[String]): Check =
      Check(s"domain_$c",
        sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L).otherwise(0L)),
        _ === 0L)

    /** Table is non-empty (metric = row count; pass = > 0). */
    val nonEmpty: Check = Check("rows_nonempty", count(lit(1)), _ > 0L)
  }

  /** Run the declared checks in one aggregation pass. Output: one row
    * per check — `(check, metric, passed)`, ordered by check name. */
  def constraintChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "constraintChecks: empty check list")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("long").as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"__m$i").as("metric"),
        c.pass(col(s"__m$i")).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
      .orderBy("check")
  }

  /** One-pass numeric column profile — the dataset-card summary:
    * per column `(column, n, n_null, n_distinct, min_bp, max_bp,
    * sum_bp)` with values in exact basis points (`floor(x * 10000)` —
    * floor of one IEEE multiply is bit-identical across engines, and
    * the integer sum is shuffle-order-free where a float sum is not).
    *
    * Long-sum headroom: |sum_bp| stays exact below 2^63 — ~9e9 rows of
    * price-sized (1e9 bp) values; beyond that switch the sum leg to
    * decimal(38,0) (same plan, wider state — see statsCorrMoments). */
  def columnSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnSummary: empty column list")
    val bp = (c: String) => floor(col(c).cast("double") * 10000d).cast("long")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(bp(c)).as(s"__mn_$c"),
        max(bp(c)).as(s"__mx_$c"),
        sum(bp(c)).as(s"__s_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_bp"), col(s"__mx_$c").as("max_bp"),
        col(s"__s_$c").as("sum_bp"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("column")
  }

  /** Gate: the pre-training validation verdict on `orders` — key
    * uniqueness, FK completeness, a domain constraint, a range
    * constraint, and non-emptiness, all from one scan. */
  val profileChecks: Q = (s, dir) =>
    constraintChecks(t(s, dir, "orders"), Seq(
      Check.nonEmpty,
      Check.complete("o_custkey"),
      Check.unique("o_orderkey"),
      Check.atLeast("o_totalprice", 0d),
      Check.inSet("o_orderstatus", Seq("O", "F", "P"))))

  /** Gate: the numeric dataset card for `lineitem`'s measure columns. */
  val profileSummary: Q = (s, dir) =>
    columnSummary(t(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Gate: the per-source ingest-quality baseline over `documents` —
    * the static side of the streaming drift monitor
    * ([[graft.streaming.QualityMonitor.qualityDrift]]); oracle-checking
    * it here pins the exact integer-bp semantics the stream compares
    * against. */
  val qualityBaseline: Q = (s, dir) =>
    graft.streaming.QualityMonitor.baselineProfile(t(s, dir, "documents"))
      .orderBy("source")

  /** Gate: table-level bookkeeping stats — row count + key range for
    * the two fact tables, the numbers partition planning and ingest
    * reconciliation ask for constantly at 100 TB. Under the engine's
    * V2-reader default (GraftSession, r14) each leg plans as
    * `PushedAggregation: [COUNT(*), MIN(..), MAX(..)]` and is answered
    * from parquet row-group FOOTERS — zero data pages read — so this
    * row is the footer-read capability as a first-class oracle-checked
    * query rather than a spec-only demonstration (Round14Spec asserts
    * the plan shape on this exact query). The aggregate sits directly
    * on the scan (no filter, no projection expressions) because that
    * is the contract aggregate pushdown requires; the union of the
    * two one-row legs happens above the pushed scans. */
  val profileFooterStats: Q = (s, dir) => {
    def leg(table: String, key: String) =
      t(s, dir, table).agg(
        count(lit(1)).as("n_rows"),
        min(col(key)).as("key_min"), max(col(key)).as("key_max"))
        .select(lit(table).as("table"), col("n_rows"),
          col("key_min"), col("key_max"))
    leg("lineitem", "l_orderkey").unionByName(leg("orders", "o_orderkey"))
      .orderBy("table")
  }

  val queries: Map[String, Q] = Map(
    "x_profile_checks" -> profileChecks,
    "x_profile_summary" -> profileSummary,
    "x_profile_footer_stats" -> profileFooterStats,
    "x_quality_baseline" -> qualityBaseline)

  private def summaryLeg(c: String): String =
    s"SELECT '$c' AS \"column\", CAST(COUNT(*) AS BIGINT) AS n, " +
      s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null, " +
      s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, " +
      s"CAST(MIN(CAST(floor($c * 10000) AS BIGINT)) AS BIGINT) AS min_bp, " +
      s"CAST(MAX(CAST(floor($c * 10000) AS BIGINT)) AS BIGINT) AS max_bp, " +
      s"CAST(SUM(CAST(floor($c * 10000) AS BIGINT)) AS BIGINT) AS sum_bp " +
      "FROM lineitem"

  val oracles: Map[String, String] = Map(
    "x_profile_checks" ->
      ("WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS v_complete, " +
        "CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique, " +
        "CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_min, " +
        "CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_domain " +
        "FROM orders) " +
        "SELECT 'complete_o_custkey' AS \"check\", v_complete AS metric, v_complete = 0 AS passed FROM m " +
        "UNION ALL SELECT 'domain_o_orderstatus', v_domain, v_domain = 0 FROM m " +
        "UNION ALL SELECT 'min_o_totalprice', v_min, v_min = 0 FROM m " +
        "UNION ALL SELECT 'rows_nonempty', n_rows, n_rows > 0 FROM m " +
        "UNION ALL SELECT 'unique_o_orderkey', v_unique, v_unique = 0 FROM m " +
        "ORDER BY \"check\""),
    "x_profile_summary" ->
      (Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
        .map(summaryLeg).mkString("", " UNION ALL ", " ORDER BY \"column\"")),
    "x_profile_footer_stats" ->
      ("SELECT 'lineitem' AS \"table\", CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "MIN(l_orderkey) AS key_min, MAX(l_orderkey) AS key_max FROM lineitem " +
        "UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT), " +
        "MIN(o_orderkey), MAX(o_orderkey) FROM orders ORDER BY \"table\""),
    "x_quality_baseline" ->
      ("WITH d AS (SELECT source, " +
        "CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END AS empty, " +
        "length(COALESCE(text, '')) AS len, " +
        "CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END AS nonascii " +
        "FROM documents), " +
        "g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS b_docs, " +
        "CAST(SUM(empty) AS BIGINT) AS b_empty, CAST(SUM(len) AS BIGINT) AS b_chars, " +
        "CAST(SUM(nonascii) AS BIGINT) AS b_nonascii FROM d GROUP BY source) " +
        "SELECT source, b_chars * 10000 // greatest(b_docs - b_empty, 1) AS base_len_bp, " +
        "b_empty * 10000 // b_docs AS base_empty_bp, " +
        "b_nonascii * 10000 // b_docs AS base_nonascii_bp " +
        "FROM g ORDER BY source"))
}
