package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators the reference lacks (its workload is
  * batch-relational only — SURVEY.md §1.1) but any large-scale event
  * pipeline needs: point-in-time (as-of) join and bounded range join.
  *
  * Scale design — both avoid the naive O(|left| x |right|) range
  * cross-join that Spark's optimizer would otherwise plan for an
  * inequality condition:
  *
  *  - [[asOfJoin]] is the union-merge formulation: tag both streams,
  *    union them (no join at all), sort within each user partition
  *    once, and carry the last left-row forward with a running
  *    `last(..., ignoreNulls)` window. ONE shuffle on the equality
  *    key, linear work per partition, identical shape on a
  *    1000-executor cluster because users are independent.
  *
  *  - [[rangeCountJoin]] buckets time into interval-width buckets and
  *    equi-joins on (user, bucket) ∪ (user, bucket-1) — every true
  *    match lands in one of the two buckets, so the range predicate
  *    only post-filters a candidate set that is bounded by bucket
  *    density, never the full pair space. This is the standard
  *    bucketized range-join rewrite (what Databricks' range-join hint
  *    does) expressed with built-ins.
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  /** ts arrives as raw nanos (LongType — see Tables.t). */
  private def tsSec = expr("ts div 1000000000")

  /** As-of join: attach to each `right` row (at r_sec) the greatest
    * `leftSec` <= r_sec within the same `key` partition. Returns the
    * right frame + `asof_sec` column (null when no prior left row).
    * Ties at equal seconds count as "prior" (<=), implemented by
    * sorting left rows before right rows at the same timestamp. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftSec: String, rightSec: String): DataFrame = {
    val rightCols = right.columns.toSeq
    val carried = rightCols.filterNot(_ == key)
    val rTypes = right.schema.map(f => f.name -> f.dataType).toMap
    // Right rows carry their full payload through the union; left rows
    // pad it with typed nulls. No row id, no join-back — the output is
    // produced directly by the one windowed pass (a second join on a
    // synthetic id would be a whole extra shuffle at scale).
    val l = left.select(
      col(key) +: col(leftSec).as("__sec") +: lit(0).as("__kind") +:
        carried.map(c => lit(null).cast(rTypes(c)).as(c)): _*)
    val r = right.select(
      col(key) +: col(rightSec).as("__sec") +: lit(1).as("__kind") +:
        carried.map(col): _*)
    val w = Window.partitionBy(key).orderBy("__sec", "__kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof",
        last(when(col("__kind") === 0, col("__sec")), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select((rightCols.map(col) :+ col("__asof").as("asof_sec")): _*)
  }

  /** Purchase-to-last-click attribution as an as-of join: each
    * purchase gets the second of the user's most recent click at or
    * before it. */
  val eventsAsof: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsSec.as("sec"))
    val clicks = e.filter(col("event_type") === "click").select(col("user_id"), col("sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("sec").as("p_sec"))
    asOfJoin(clicks, purchases, "user_id", "sec", "p_sec")
      .select(col("user_id"), col("event_id"), col("p_sec"), col("asof_sec").as("c_sec"))
      .orderBy("user_id", "event_id")
  }

  /** Bounded range-count join: for each right row, count left rows with
    * sec in (r_sec - width, r_sec] on the same key, via the two-bucket
    * equi-join rewrite. Zero-match rows are preserved with count 0. */
  def rangeCountJoin(left: DataFrame, right: DataFrame, key: String,
      leftSec: String, rightSec: String, width: Long): DataFrame = {
    val l = left.select(col(key), col(leftSec).as("__lsec"))
      .withColumn("__bucket", expr(s"__lsec div $width"))
    // The synthetic row id feeds BOTH the probe side and the restore
    // join, and Spark re-executes the subtree per consumer;
    // monotonically_increasing_id is partitioning-dependent, so the two
    // executions could disagree on ids under AQE re-planning — the ids
    // must be materialized ONCE to be a join key at all.
    val rWithId = right.withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val probes = rWithId
      .select(col("__rid"), col(key), col(rightSec).as("__rsec"))
      .withColumn("__bucket",
        explode(array(expr(s"__rsec div $width"), expr(s"__rsec div $width - 1"))))
    val hits = probes.join(l, Seq(key, "__bucket"))
      .filter(col("__lsec") > col("__rsec") - width && col("__lsec") <= col("__rsec"))
      .groupBy("__rid").agg(count(lit(1)).as("__n"))
    rWithId.join(hits, Seq("__rid"), "left")
      .withColumn("n_in_range", coalesce(col("__n"), lit(0L)))
      .drop("__rid", "__n")
  }

  /** Clicks within the hour before each purchase (inclusive bound). */
  val eventsRangeCount: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsSec.as("sec"))
    val clicks = e.filter(col("event_type") === "click").select(col("user_id"), col("sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("sec").as("p_sec"))
    rangeCountJoin(clicks, purchases, "user_id", "sec", "p_sec", 3600L)
      .select(col("user_id"), col("event_id"), col("p_sec"), col("n_in_range").as("n_clicks"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, Q] = Map(
    "x_events_asof" -> eventsAsof,
    "x_events_range_count" -> eventsRangeCount)

  private val eventsCte =
    "WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
      "p AS (SELECT user_id, event_id, sec FROM e WHERE event_type = 'purchase'), " +
      "c AS (SELECT user_id, sec FROM e WHERE event_type = 'click') "

  val oracles: Map[String, String] = Map(
    "x_events_asof" ->
      (eventsCte +
        "SELECT p.user_id, p.event_id, p.sec AS p_sec, " +
        "(SELECT MAX(c.sec) FROM c WHERE c.user_id = p.user_id AND c.sec <= p.sec) AS c_sec " +
        "FROM p ORDER BY user_id, event_id"),
    "x_events_range_count" ->
      (eventsCte +
        "SELECT p.user_id, p.event_id, p.sec AS p_sec, " +
        "CAST((SELECT COUNT(*) FROM c WHERE c.user_id = p.user_id AND c.sec > p.sec - 3600 AND c.sec <= p.sec) AS BIGINT) AS n_clicks " +
        "FROM p ORDER BY user_id, event_id"))
}
