package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event analytics in
  * `graft.operators.EventsOps` (driver north star; the reference is
  * batch-only — SURVEY.md §1.1). Same logical transforms as batch, so
  * semantics are shared; these wrap them with event-time watermarks
  * and keyed state.
  *
  * Scale notes: windowed counts are partial-aggregated per
  * micro-batch and state is keyed by (window, event_type) — bounded by
  * the watermark horizon. Sessionization keeps one small state object
  * per user key; state store pressure is O(active users), not events.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(sessionCount: Long, lastSeenMs: Long)
  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Hourly tumbling-window counts with a 2-hour watermark: late
    * events beyond the horizon are dropped, state is evicted. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast(LongType)).as("value_c"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("value_c"))

  /** Stream-stream join: attribute purchases to the same user's
    * clicks within the preceding hour. Both sides carry event-time
    * watermarks and the join condition bounds the time range, so each
    * side's state is evicted once the watermark passes — the only
    * shape a stream-stream join can hold at 100 TB/day. */
  def attributePurchases(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "inner")
      .select("user_id", "purchase_id", "click_id", "purchase_ts", "click_ts", "value")
  }

  /** Streaming exact dedup: drop events whose event_id was already
    * seen, with state bounded by the watermark horizon
    * (dropDuplicatesWithinWatermark — late duplicates beyond 2h are
    * the accepted trade-off for bounded state at 100 TB/day rates). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization via the BUILT-IN session_window
    * aggregation — the declarative alternative to [[sessionize]]'s
    * explicit keyed state (same operator the batch
    * `x_events_session_window` query uses, so batch and stream share
    * semantics). The watermark both admits late events and evicts
    * closed-session state; merging of overlapping windows is the
    * engine's job, not ours. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Windowed sketch percentiles over the value stream: hourly p50/p95
    * via approx_percentile — the sketch (fixed-size state) is the only
    * viable shape for percentiles under unbounded input; exact sorted
    * buffers would grow with the window's event count. */
  def hourlyValueQuantiles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("p"))
      .select(col("w.start").as("hour"),
        col("p").getItem(0).as("p50"), col("p").getItem(1).as("p95"))

  /** STREAM-STATIC join: flag incoming documents whose LSH bands
    * collide with a static corpus index — streaming near-dup candidate
    * detection against yesterday's corpus. Stream-static inner joins
    * are STATELESS (no watermark, no state store): each micro-batch
    * probes the static side and moves on — the only join class that
    * costs nothing to keep running forever. The stream side uses the
    * per-row (aggregation-free) minhash so the whole stream plan stays
    * append-mode; the static index is pinned once instead of being
    * recomputed every micro-batch. Emits (doc_id, corpus_id)
    * candidates — a pair can appear once per colliding band (streaming
    * dropDuplicates would hold unbounded state, defeating the
    * stateless point; the downstream batch verifier dedupes for
    * free). */
  def nearDupCandidates(docStream: DataFrame, corpusDocs: DataFrame): DataFrame = {
    import graft.operators.Dedup
    val corpusIndex = Dedup.minhashBands(corpusDocs)
      .select(col("doc_id").as("corpus_id"), col("band"), col("bh"))
      .localCheckpoint()
    Dedup.rowMinhashBands(docStream)
      .join(corpusIndex, Seq("band", "bh"))
      .select(col("doc_id"), col("corpus_id"))
  }

  /** Idempotent per-batch parquet sink — the exactly-once pattern for
    * foreachBatch output. Structured Streaming guarantees foreachBatch
    * AT-LEAST-once: after a failure the engine replays the last
    * uncommitted batch with the SAME batchId. Writing each batch into
    * its own `batch_id=` partition with DYNAMIC partition overwrite
    * makes the replay rewrite exactly that partition — duplicates are
    * structurally impossible, and no read-before-write dedup state is
    * needed (the property a 100 TB/day sink must have: idempotence by
    * layout, not by lookup). */
  def idempotentParquetSink(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** [[nearDupCandidates]] wired to the idempotent sink: candidates
    * land in `path` partitioned by micro-batch, checkpointed at
    * `checkpointDir`; batch replays rewrite their own partition. */
  def nearDupCandidatesToParquet(docStream: DataFrame, corpusDocs: DataFrame,
      path: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    nearDupCandidates(docStream, corpusDocs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentParquetSink(path) _)
      .start()

  /** Gap-based sessionization with explicit keyed state
    * (mapGroupsWithState): a new session starts after >30 min of
    * inactivity; emits the running session/event count per user.
    * In production add a GroupStateTimeout (event-time + watermark) so
    * idle users' state is evicted; kept timeout-free here because a
    * pending timeout keeps scheduling batches, which makes
    * deterministic testing (processAllAvailable) impossible. */
  def sessionize(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, evts, state: GroupState[SessionState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prior = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var (sessions, last) = (prior.sessionCount, prior.lastSeenMs)
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (last == Long.MinValue || t - last > gapMs) sessions += 1
            last = t
          }
          state.update(SessionState(sessions, last))
          SessionUpdate(userId, sessions, sorted.size.toLong)
      }
  }

  final case class HourCount(event_type: String, hour: Long, n_events: Long)
  final case class AnomalyState(hours: List[(Long, Long)])
  final case class AnomalyFlag(event_type: String, hour: Long, n_events: Long,
      n_obs: Long, anomaly: Int)

  /** Streaming twin of [[graft.operators.EventsOps.eventsAnomaly]]:
    * per event type, flag an hour whose count exceeds
    * mean + 2·stddev of the trailing `window` observed hours. State is
    * a bounded per-type list of (hour, count) — `window` entries, a
    * few hundred bytes — maintained with flatMapGroupsWithState. The
    * same integer-moment arithmetic as the batch op, evaluated over
    * the rolling buffer; feed it CLOSED hourly counts (e.g. the output
    * of [[hourlyCounts]] after the watermark flush) so each hour is
    * observed once and in order per type. */
  def anomalyFlags(hourCounts: Dataset[HourCount],
      window: Int = 24): Dataset[AnomalyFlag] = {
    import hourCounts.sparkSession.implicits._
    hourCounts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (tpe, rows, state: GroupState[AnomalyState]) =>
          var hours = state.getOption.getOrElse(AnomalyState(Nil)).hours
          val out = rows.toSeq.sortBy(_.hour).map { hc =>
            val prior = hours.filter(_._1 < hc.hour).takeRight(window)
            val nObs = prior.size.toLong
            val flag =
              if (nObs < 2) 0
              else {
                val n = nObs.toDouble
                val s = prior.map(_._2).sum.toDouble
                val ss = prior.map(h => h._2 * h._2).sum.toDouble
                val mean = s / n
                val std = math.sqrt((n * ss - s * s) / (n * (n - 1.0)))
                if (hc.n_events.toDouble > mean + 2.0 * std) 1 else 0
              }
            hours = ((hc.hour, hc.n_events) :: hours)
              .sortBy(_._1).takeRight(window + 1)
            AnomalyFlag(tpe, hc.hour, hc.n_events, nObs, flag)
          }
          state.update(AnomalyState(hours))
          out.iterator
      }
  }

  final case class PathState(lastType: String, lastMs: Long)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of [[graft.operators.EventsOps.eventsPathBigrams]]:
    * per-user keyed state holds only the LAST event's (type, time);
    * each arriving event emits one transition row — `^` as the
    * from-state when there is no prior event or the gap exceeds
    * `gapMs` (session start), the prior type otherwise. The transition
    * stream is append-mode and can feed a downstream windowed
    * `groupBy(from, to).count` or a raw sink unchanged.
    *
    * State is one (string, long) per active user — O(users), not
    * O(events) — and the emit rule is exactly the batch op's lag
    * semantics, so a replayed history produces the identical
    * transition multiset (spec-verified against the batch plan).
    * Production note: same GroupStateTimeout caveat as [[sessionize]]
    * — add an event-time timeout to evict idle users; NoTimeout here
    * keeps processAllAvailable deterministic for specs. */
  final case class FunnelState(stage: Int, lastMs: Long)
  final case class FunnelUpdate(user_id: Long, stage: Int, stage_ms: Long)

  /** Streaming funnel progression — the continuous twin of
    * [[graft.operators.Temporal.funnelSteps]]'s strict-ordered chain.
    * Per-user state is exactly (stage reached, that stage's first
    * qualifying event time) — O(users) state like [[sessionize]] —
    * and each micro-batch emits one [[FunnelUpdate]] per stage a user
    * ADVANCES through (append-mode; consumers count max stage per
    * user for the live conversion table).
    *
    * Ordering contract, same as [[pathTransitions]]: events are
    * event-time-sorted WITHIN each batch (the iterator is re-sorted),
    * so prefixes delivered in event-time order reproduce the batch
    * funnel exactly (QualityMonitorSpec pins this); an event arriving
    * in a LATER batch with an earlier timestamp cannot retro-advance
    * a stage — the documented batch-lag semantics every
    * flatMapGroupsWithState op here shares. */
  def funnelProgress(events: Dataset[Event],
      steps: Seq[String]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, evts, state: GroupState[FunnelState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelUpdate]
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (st.stage < steps.size && e.event_type == steps(st.stage) &&
              (st.stage == 0 || t > st.lastMs)) {
              st = FunnelState(st.stage + 1, t)
              out += FunnelUpdate(uid, st.stage, t)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def pathTransitions(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, evts, state: GroupState[PathState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(PathState(null, Long.MinValue))
          val out = sorted.map { e =>
            val t = e.ts.getTime
            val from =
              if (st.lastMs == Long.MinValue || t - st.lastMs > gapMs) "^"
              else st.lastType
            st = PathState(e.event_type, t)
            Transition(uid, from, e.event_type)
          }
          state.update(st)
          out.iterator
      }
  }
}
