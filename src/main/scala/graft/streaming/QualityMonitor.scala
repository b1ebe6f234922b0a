package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest-quality monitoring — the continuous form of the
  * batch profiling in [[graft.operators.Profile]] (reference checks
  * run per-release; a crawl pipeline needs them per-window, while the
  * data is still arriving). Two pieces:
  *
  *   1. [[windowedQuality]] — per (event-time window, source) corpus
  *      health metrics: volume, empty/whitespace docs, char mass,
  *      length extrema, approximate distinct ids (exact distinct is
  *      not a streaming aggregate — the HLL sketch is the bounded-
  *      state form), and non-ASCII-heavy doc counts (the "encoding
  *      went sideways upstream" tripwire).
  *   2. [[qualityDrift]] — the windowed metrics joined (stream-static
  *      broadcast, stateless) against a baseline profile computed by
  *      [[baselineProfile]] over a reference corpus, emitting integer
  *      basis-point deviations and boolean drift flags per window.
  *
  * Scale shape: one watermarked partial-aggregated groupBy keyed by
  * (window, source) — state is O(active windows x sources), evicted by
  * the watermark; metric math happens AFTER aggregation on
  * window-sized rows; the baseline is a tiny static side pinned once
  * and broadcast, so the drift join adds no state and no shuffle. All
  * ratios are integer basis points (floor division) so batch replays
  * and engine differences can't wiggle a flag.
  */
object QualityMonitor {

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp,
      source: String, text: String)

  /** Per-(window, source) quality metrics. Watermark bounds both
    * lateness and state. */
  def windowedQuality(docs: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
          .otherwise(0L)).as("n_empty"),
        sum(length(coalesce(col("text"), lit(""))).cast(LongType)).as("n_chars"),
        min(length(col("text"))).as("min_len"),
        max(length(col("text"))).as("max_len"),
        approx_count_distinct(col("doc_id")).as("n_ids_approx"),
        sum(when(col("text").rlike("[^\\x00-\\x7F]"), 1L).otherwise(0L))
          .as("n_nonascii"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("n_empty"), col("n_chars"),
        col("min_len"), col("max_len"), col("n_ids_approx"), col("n_nonascii"))

  /** Per-(window, source) frequent tokens with BOUNDED state: the
    * [[graft.functions.HeavyHitters]] Misra-Gries summary as a
    * streaming aggregate — state per open window is k (token, counter)
    * pairs plus the token total, never the token domain, and the MG
    * merge (keyed sum + cut) is exactly what the state store applies
    * per micro-batch, so the N/(k+1) capture guarantee holds across
    * any batch arrival order (the mergeable-summaries property, now
    * load-bearing under streaming). The content tripwire next to
    * [[windowedQuality]]'s shape metrics: a boilerplate flood or a
    * stuck upstream producer shows up as one token (or template
    * fragment) suddenly dominating its window's summary. Counters are
    * order-dependent (only the capture guarantee is deterministic) —
    * QualityMonitorSpec checks the guarantee against per-window exact
    * counts, the same contract as the batch gate row. */
  def windowedHeavyHitters(docs: DataFrame, k: Int = 64,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val hh = udaf(new graft.functions.HeavyHitters(k),
      org.apache.spark.sql.Encoders.STRING)
    docs.withWatermark("ts", watermark)
      .select(col("ts"), col("source"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(count(lit(1)).as("n_toks"), hh(col("tok")).as("candidates"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_toks"), col("candidates"))
  }

  /** Static baseline from a reference corpus: per-source mean length
    * and empty/non-ASCII ratios, all in exact basis points. */
  def baselineProfile(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("b_docs"),
        sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
          .otherwise(0L)).as("b_empty"),
        sum(length(coalesce(col("text"), lit(""))).cast(LongType)).as("b_chars"),
        sum(when(col("text").rlike("[^\\x00-\\x7F]"), 1L).otherwise(0L))
          .as("b_nonascii"))
      .select(col("source"),
        expr("b_chars * 10000 div greatest(b_docs - b_empty, 1)").as("base_len_bp"),
        expr("b_empty * 10000 div b_docs").as("base_empty_bp"),
        expr("b_nonascii * 10000 div b_docs").as("base_nonascii_bp"))

  /** Windowed drift report: current-window mean length / empty ratio /
    * non-ASCII ratio vs baseline, flagged when the relative deviation
    * exceeds `tolBp` basis points of the baseline value (length) or
    * the absolute ratio moves more than `tolBp` (empty / non-ASCII —
    * relative deviation is meaningless around a ~0 baseline). Sources
    * unseen in the baseline survive the left join with null baselines
    * and flag as drifted — a brand-new source IS an anomaly. */
  def qualityDrift(docs: DataFrame, baseline: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      tolBp: Long = 2000L): DataFrame = {
    val base = broadcast(baseline.localCheckpoint())
    windowedQuality(docs, windowLen, watermark)
      .withColumn("len_bp",
        expr("n_chars * 10000 div greatest(n_docs - n_empty, 1)"))
      .withColumn("empty_bp", expr("n_empty * 10000 div n_docs"))
      .withColumn("nonascii_bp", expr("n_nonascii * 10000 div n_docs"))
      .join(base, Seq("source"), "left")
      .withColumn("len_dev_bp",
        when(col("base_len_bp").isNull, lit(10000L))
          .otherwise(expr(
            "abs(len_bp - base_len_bp) * 10000 div greatest(base_len_bp, 1)")))
      .withColumn("drift_len", col("len_dev_bp") > tolBp)
      .withColumn("drift_empty",
        col("base_empty_bp").isNull ||
          abs(col("empty_bp") - col("base_empty_bp")) > tolBp)
      .withColumn("drift_nonascii",
        col("base_nonascii_bp").isNull ||
          abs(col("nonascii_bp") - col("base_nonascii_bp")) > tolBp)
      .select("window_start", "source", "n_docs", "n_empty", "len_bp",
        "empty_bp", "nonascii_bp", "len_dev_bp",
        "drift_len", "drift_empty", "drift_nonascii")
  }
}
