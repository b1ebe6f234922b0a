package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table (driver north star;
  * the reference is batch-only — SURVEY.md §1.1). These are the batch
  * forms; `graft.streaming` hosts the Structured Streaming versions of
  * the same logic so batch and stream share semantics.
  *
  * Scale notes: hourly rollup is a partial-aggregated groupBy (map-side
  * combine shrinks the shuffle to |hours|x|event types| rows per task);
  * sessionization shuffles once on user_id and computes lag/cumsum
  * within the partition — the same shape survives 1000 executors
  * because users are independent.
  */
object EventsOps {

  type Q = (SparkSession, String) => DataFrame

  /** ts arrives as raw nanos (LongType — see Tables.t); integer
    * division to seconds is exact where double math would not be. */
  private def tsSec = expr("ts div 1000000000")

  /** Hourly windowed aggregate; hour rendered as a string so the
    * oracle compare is timezone-dialect-proof. */
  val eventsHourly: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("ts_sec", tsSec)
      .groupBy(
        from_unixtime(col("ts_sec") - pmod(col("ts_sec"), lit(3600))).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast(LongType)).as("value_c"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity): lag over
    * (user, time) then a per-user sum of session starts. Second
    * resolution on both sides so the oracle ordering is identical. */
  val eventsSessionize: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), tsSec.as("ts_sec"))
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    e.withColumn("prev_sec", lag("ts_sec", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 1800, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "x_events_hourly" -> eventsHourly,
    "x_events_sessionize" -> eventsSessionize)

  val oracles: Map[String, String] = Map(
    "x_events_hourly" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, " +
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_c " +
        "FROM events GROUP BY hour, event_type ORDER BY hour, event_type"),
    "x_events_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "s AS (SELECT user_id, CASE WHEN lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) IS NULL " +
        "OR ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > 1800 THEN 1 ELSE 0 END AS new_sess FROM e) " +
        "SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM s GROUP BY user_id ORDER BY user_id"))
}
