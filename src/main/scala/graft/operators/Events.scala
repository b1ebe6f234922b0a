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

  /** Sessionization via the BUILT-IN session_window aggregation — the
    * Spark-native form of [[eventsSessionize]]'s lag/cumsum (and the
    * only form that also runs under Structured Streaming with state
    * cleanup for free). Boundary nuance the oracle mirrors: a session
    * window is [event, event+gap) with an EXCLUSIVE end, so a gap of
    * exactly 30 min starts a new session (>= in the oracle's lag
    * split), whereas the lag formulation above splits only on > 30
    * min. Session start is emitted as epoch seconds so the compare is
    * timezone-proof. */
  val eventsSessionWindow: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("ts_sec", tsSec)
      .groupBy(col("user_id"),
        session_window(timestamp_seconds(col("ts_sec")), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").cast(LongType).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** Session-path Markov transition profile: counts of consecutive
    * within-session (from_type -> to_type) event pairs, with a `^`
    * pseudo-state for session starts so the profile is a complete
    * first-order chain (initial distribution included). Same 30-min
    * gap rule as [[eventsSessionize]] — a transition exists iff the
    * gap to the previous event is <= 1800s; otherwise the event is a
    * session start. Scale shape: ONE shuffle on user_id for the lag
    * window, then a partial-aggregated groupBy whose key space is at
    * most (|types|+1) x |types| — the shuffle after the window moves
    * one row per transition pre-combined per task, and users are
    * independent so 1000 executors partition cleanly. */
  val eventsPathBigrams: Q = (s, dir) =>
    pathBigrams(t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsSec.as("ts_sec")))

  /** DataFrame core of [[eventsPathBigrams]]: input carries
    * (user_id, event_id, event_type, ts_sec). */
  def pathBigrams(e: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    e.withColumn("prev_sec", lag("ts_sec", 1).over(w))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("from_type",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > gapSec, lit("^"))
          .otherwise(col("prev_type")))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Top-20 most common full session paths ("view>click>purchase"),
    * ties broken by path. Within-session order is made deterministic
    * engine-independently by sorting (ts_sec, event_id, type) structs
    * INSIDE the aggregate (array_sort of collect_list — collect order
    * is not a contract, the sort is), mirroring the oracle's ordered
    * string_agg. Scale shape: sessions are bounded (30-min gaps), so
    * per-group state is small; the path->count agg is partial-combined
    * and the top-20 is a TakeOrderedAndProject, never a global sort. */
  val eventsPathTopk: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsSec.as("ts_sec"))
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    e.withColumn("prev_sec", lag("ts_sec", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum("new_sess").over(w))
      .groupBy("user_id", "sid")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_sec"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")),
        ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path")).limit(20)
  }

  /** Per-user click/purchase timeline via typed COGROUP — the
    * Dataset-API surface for "merge two grouped streams with arbitrary
    * logic" (SURVEY §2.10's per-group apply, beyond what joins
    * express). One shuffle per side on user_id; group pairs stream
    * through the function without materializing either side globally.
    * The logic here is deliberately aggregate-shaped so a FULL OUTER
    * JOIN oracle can verify the cogroup plumbing exactly. */
  val eventsCogroup: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), tsSec.as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec")).as[(Long, Long)]
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec")).as[(Long, Long)]
    clicks.groupByKey(_._1).cogroup(purchases.groupByKey(_._1)) { (uid, cs, ps) =>
      var nC = 0L; var firstC = Long.MaxValue
      cs.foreach { c => nC += 1; if (c._2 < firstC) firstC = c._2 }
      var nP = 0L; var firstP = Long.MaxValue
      ps.foreach { p => nP += 1; if (p._2 < firstP) firstP = p._2 }
      Iterator((uid, nC, nP,
        if (nC > 0) Some(firstC) else None,
        if (nP > 0) Some(firstP) else None))
    }.toDF("user_id", "n_clicks", "n_purchases", "first_click_sec", "first_purchase_sec")
      .orderBy("user_id")
  }

  /** Ordered funnel analysis: per user, the earliest view, the
    * earliest click AT OR AFTER that view, and the earliest purchase
    * at or after that click — i.e. the canonical "did the user walk
    * view → click → purchase in order" question, which a plain
    * per-type min() gets wrong (a purchase before the first view must
    * not count).
    *
    * Shape: three sequential window passes over the SAME user
    * partitioning — each stage's min is conditioned on the previous
    * stage's column, and because the window spec never changes, Spark
    * plans ONE Exchange and stacks the Window operators on top of it
    * (plan-asserted in spec). The final per-user collapse is a groupBy
    * over already-partitioned rows. Users are independent — same
    * 1000-executor argument as sessionization. */
  val eventsFunnel: Q = (s, dir) => {
    val w = Window.partitionBy("user_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), tsSec.as("sec"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("sec"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("sec") >= col("t_view"),
          col("sec"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("sec") >= col("t_click"),
          col("sec"))).over(w))
      .groupBy("user_id")
      .agg(min("t_view").as("t_view"), min("t_click").as("t_click"),
        min("t_purchase").as("t_purchase"))
      .withColumn("stage",
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0))
      .orderBy("user_id")
  }

  /** Time-based sliding aggregate: per event, the count and
    * integer-cents sum of the SAME USER's events in the preceding hour
    * (RANGE frame on the ordering value, not a row count — the frame
    * every "activity in the last N minutes" feature needs; w4's rows
    * frame is the fixed-row-count cousin). Cents keep the running sum
    * exact and engine-portable where a double sum would depend on
    * accumulation order. One shuffle on user_id; frame state is the
    * in-range suffix, bounded by event density per hour. */
  val eventsRangeFrame: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), tsSec.as("sec"),
        floor(col("value") * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-3600, Window.currentRow)
    e.withColumn("n_hour", count(lit(1)).over(w))
      .withColumn("cents_hour", sum("cents").over(w))
      .orderBy("user_id", "event_id")
  }

  /** Schema-on-read over a semi-structured payload column with
    * corrupt-record routing: extract `$.k` from the JSON props, route
    * rows that don't parse to a corrupt counter instead of failing the
    * job (the PERMISSIVE-mode discipline every heterogeneous 100 TB
    * ingest needs — one bad row must cost one counter bump, not the
    * batch). Per-row JSON path extraction is codegen'd; the per-user
    * fold is one partial-aggregated groupBy. */
  val eventsPropsParse: Q = (s, dir) =>
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .withColumn("is_corrupt", when(col("k").isNull, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("is_corrupt").as("n_corrupt"),
        sum(coalesce(col("k"), lit(0L))).as("sum_k"))
      .orderBy("user_id")

  /** Trailing-window anomaly detection: flag hours whose event count
    * exceeds mean + 2·stddev of the type's previous 24 observed hours.
    * The trailing moments are INTEGER sums over counts (exact, so the
    * derived mean/stddev/flag are bit-portable — same discipline as
    * [[graft.operators.Sampling.statsCorrMoments]]); a streamed
    * deployment keeps the same per-type frame as
    * mapGroupsWithState rolling state. One shuffle for the hourly
    * rollup, one window pass per type. */
  val eventsAnomaly: Q = (s, dir) => {
    val hourly = t(s, dir, "events")
      .select(col("event_type"), tsSec.as("sec"))
      .groupBy(col("event_type"), expr("sec div 3600").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-24, -1)
    val n = col("n_obs").cast("double")
    val (sm, ss) = (col("s").cast("double"), col("ss").cast("double"))
    val mean = sm / n
    val std = sqrt((n * ss - sm * sm) / (n * (n - lit(1.0))))
    hourly
      .withColumn("n_obs", count(lit(1)).over(w))
      .withColumn("s", sum("n_events").over(w))
      .withColumn("ss", sum(col("n_events") * col("n_events")).over(w))
      .select(col("event_type"), col("hour"), col("n_events"), col("n_obs"),
        when(col("n_obs") >= 1, mean).as("mean_prior"),
        when(col("n_obs") >= 2, std).as("std_prior"),
        when(col("n_obs") >= 2 &&
          col("n_events").cast("double") > mean + lit(2.0) * std, 1)
          .otherwise(0).as("anomaly"))
      .orderBy("event_type", "hour")
  }

  /** Cohort retention: bucket every user by their first-seen hour
    * (the cohort), then count, per (cohort, age-in-hours), how many of
    * its users were active — the classic retention triangle. Hours are
    * integer epoch-hours so every value is exact. Scale shape: the
    * cohort table is USER-sized — smaller than the event log but
    * unbounded, so the join back onto events is deliberately un-hinted
    * (AQE broadcasts while it fits, shuffles on user_id past that; a
    * forced hint is a driver OOM at 100× users). The (user, cohort,
    * age) dedup and the final count are both partial-aggregated
    * groupBys. No window over the raw log, no per-user sort. */
  val eventsRetention: Q = (s, dir) => {
    val hours = t(s, dir, "events")
      .select(col("user_id"), expr("(ts div 1000000000) div 3600").as("h"))
    val cohort = hours.groupBy("user_id").agg(min("h").as("h0"))
    hours.join(cohort, Seq("user_id"))
      .select(col("user_id"), col("h0"), (col("h") - col("h0")).as("age"))
      .distinct()
      .groupBy("h0", "age")
      .agg(count(lit(1)).as("n_users"))
      .select(col("h0").as("cohort_hour"), col("age").as("age_hours"),
        col("n_users"))
      .orderBy("cohort_hour", "age_hours")
  }

  val queries: Map[String, Q] = Map(
    "x_events_retention" -> eventsRetention,
    "x_events_anomaly" -> eventsAnomaly,
    "x_events_props_parse" -> eventsPropsParse,
    "x_events_range_frame" -> eventsRangeFrame,
    "x_events_funnel" -> eventsFunnel,
    "x_events_hourly" -> eventsHourly,
    "x_events_sessionize" -> eventsSessionize,
    "x_events_session_window" -> eventsSessionWindow,
    "x_events_path_bigrams" -> eventsPathBigrams,
    "x_events_path_topk" -> eventsPathTopk,
    "x_events_cogroup" -> eventsCogroup)

  val oracles: Map[String, String] = Map(
    "x_events_retention" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h FROM events), " +
        "c AS (SELECT user_id, MIN(h) AS h0 FROM e GROUP BY user_id), " +
        "a AS (SELECT DISTINCT e.user_id, c.h0, e.h - c.h0 AS age FROM e JOIN c USING (user_id)) " +
        "SELECT h0 AS cohort_hour, age AS age_hours, CAST(COUNT(*) AS BIGINT) AS n_users " +
        "FROM a GROUP BY h0, age ORDER BY cohort_hour, age_hours"),
    "x_events_anomaly" ->
      ("WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        "h AS (SELECT event_type, sec // 3600 AS hour, CAST(COUNT(*) AS BIGINT) AS n_events FROM e GROUP BY event_type, hour), " +
        "m AS (SELECT event_type, hour, n_events, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n_obs, " +
        "CAST(SUM(n_events) OVER w AS BIGINT) AS s, " +
        "CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS ss " +
        "FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_type, hour, n_events, n_obs, " +
        "CASE WHEN n_obs >= 1 THEN CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE) END AS mean_prior, " +
        "CASE WHEN n_obs >= 2 THEN sqrt((CAST(n_obs AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
        "(CAST(n_obs AS DOUBLE) * (CAST(n_obs AS DOUBLE) - 1.0))) END AS std_prior, " +
        "CASE WHEN n_obs >= 2 AND CAST(n_events AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE) + " +
        "2.0 * sqrt((CAST(n_obs AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
        "(CAST(n_obs AS DOUBLE) * (CAST(n_obs AS DOUBLE) - 1.0))) THEN 1 ELSE 0 END AS anomaly " +
        "FROM m ORDER BY event_type, hour"),
    "x_events_props_parse" ->
      ("WITH e AS (SELECT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt, " +
        "CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k " +
        "FROM e GROUP BY user_id ORDER BY user_id"),
    "x_events_range_frame" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, " +
        "CAST(floor(value * 100) AS BIGINT) AS cents FROM events) " +
        "SELECT user_id, event_id, sec, cents, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n_hour, " +
        "CAST(SUM(cents) OVER w AS BIGINT) AS cents_hour " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
    "x_events_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        "w1 AS (SELECT user_id, event_type, sec, MIN(CASE WHEN event_type = 'view' THEN sec END) " +
        "OVER (PARTITION BY user_id) AS t_view FROM e), " +
        "w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND sec >= t_view THEN sec END) " +
        "OVER (PARTITION BY user_id) AS t_click FROM w1), " +
        "w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND sec >= t_click THEN sec END) " +
        "OVER (PARTITION BY user_id) AS t_purchase FROM w2), " +
        "g AS (SELECT user_id, MIN(t_view) AS t_view, MIN(t_click) AS t_click, " +
        "MIN(t_purchase) AS t_purchase FROM w3 GROUP BY user_id) " +
        "SELECT user_id, t_view, t_click, t_purchase, " +
        "CASE WHEN t_purchase IS NOT NULL THEN 3 WHEN t_click IS NOT NULL THEN 2 " +
        "WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage " +
        "FROM g ORDER BY user_id"),
    "x_events_hourly" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, " +
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_c " +
        "FROM events GROUP BY hour, event_type ORDER BY hour, event_type"),
    "x_events_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "s AS (SELECT user_id, CASE WHEN lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) IS NULL " +
        "OR ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > 1800 THEN 1 ELSE 0 END AS new_sess FROM e) " +
        "SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM s GROUP BY user_id ORDER BY user_id"),
    "x_events_session_window" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        // split strictly on > gap: Spark's session_window MERGES an
        // event at exactly prev+gap (probe-verified: events at 0,
        // 1800, 3599 form ONE session) — >= here desynced the oracle
        // the first time the data contained an exact-gap pair (sf0.1)
        "s AS (SELECT user_id, sec, CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL " +
        "OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800 THEN 1 ELSE 0 END AS ns FROM e), " +
        "g AS (SELECT user_id, sec, SUM(ns) OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid FROM s) " +
        "SELECT user_id, CAST(MIN(sec) AS BIGINT) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "x_events_path_bigrams" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "w AS (SELECT user_id, event_type, ts_sec, " +
        "lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev_sec, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev_type FROM e) " +
        "SELECT CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 1800 THEN '^' ELSE prev_type END AS from_type, " +
        "event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM w GROUP BY 1, 2 ORDER BY from_type, to_type"),
    "x_events_path_topk" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "s AS (SELECT user_id, event_id, event_type, ts_sec, " +
        "CASE WHEN lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) IS NULL " +
        "OR ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > 1800 THEN 1 ELSE 0 END AS ns FROM e), " +
        "g AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s), " +
        "p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY ts_sec, event_id) AS path FROM g GROUP BY user_id, sid) " +
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p " +
        "GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20"),
    "x_events_cogroup" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        "c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks, MIN(sec) AS first_click_sec FROM e WHERE event_type = 'click' GROUP BY user_id), " +
        "p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases, MIN(sec) AS first_purchase_sec FROM e WHERE event_type = 'purchase' GROUP BY user_id) " +
        "SELECT COALESCE(c.user_id, p.user_id) AS user_id, " +
        "COALESCE(n_clicks, 0) AS n_clicks, COALESCE(n_purchases, 0) AS n_purchases, " +
        "first_click_sec, first_purchase_sec " +
        "FROM c FULL OUTER JOIN p ON c.user_id = p.user_id ORDER BY user_id"))
}
