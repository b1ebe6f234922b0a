package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionUpdate}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("hourlyCounts: tumbling windows aggregate counts and cents per type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, ts(10), 1, "click", 1.50),
        Event(2, ts(20), 2, "click", 2.25),
        Event(3, ts(70), 1, "view", 3.00))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "n", "value_c").as[(String, Long, Long)]
        .collect().toSet
      assert(rows == Set(("click", 2L, 375L), ("view", 1L, 300L)))
    } finally q.stop()
  }

  test("sessionWindows: built-in session_window merges within gap, splits across") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // session windows merge, so streaming supports only Append output:
    // results emit once the watermark passes a session's end. A far-
    // future sentinel event advances the watermark to flush the rest.
    val q = EventStreams.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0),
        Event(2, ts(10), 1, "click", 0),   // within 30 min: same session
        Event(3, ts(100), 1, "click", 0),  // 90-min gap: new session
        Event(4, ts(0), 2, "view", 0))
      q.processAllAvailable()
      input.addData(Event(99, ts(100000), 99, "view", 0)) // watermark flush
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .select("user_id", "n_events").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows(1L) == Seq(1L, 2L)) // one 2-event session + one 1-event session
      assert(rows(2L) == Seq(1L))
    } finally q.stop()
  }

  test("hourlyValueQuantiles: sketch percentiles per tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyValueQuantiles(input.toDF())
      .writeStream.format("memory").queryName("quant")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1 to 100).map(i => Event(i.toLong, ts(i % 50), 1, "view", i.toDouble)): _*)
      q.processAllAvailable()
      val (p50, p95) = spark.table("quant").select("p50", "p95")
        .as[(Double, Double)].head()
      assert(p50 >= 40.0 && p50 <= 60.0, s"p50=$p50")
      assert(p95 >= 90.0 && p95 <= 100.0, s"p95=$p95")
    } finally q.stop()
  }

  test("nearDupCandidates: stream-static join flags corpus collisions, agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val corpus = Seq((100L, base), (101L, unrelated)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.nearDupCandidates(
        input.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("near_dup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, nearDup), (2L, (1 to 40).map(i => s"qqq$i").mkString(" ")))
      q.processAllAvailable()
      val pairs = spark.table("near_dup").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 100L)), "near-dup of corpus doc must be flagged")
      assert(!pairs.exists(_._1 == 2L), "unrelated stream doc must not collide")
      // same bands as the batch index: the streaming candidates match
      // what the batch incremental path verifies
      val batch = graft.operators.Dedup.minhashLshIncremental(
        Seq((1L, nearDup)).toDF("doc_id", "text"), corpus, 0.5)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(batch == Set((1L, 100L)))
    } finally q.stop()
  }

  test("idempotentParquetSink: a replayed batch produces no duplicate output rows") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/cands"
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.nearDupCandidatesToParquet(
      input.toDF().toDF("doc_id", "text"), corpus, out, ckpt)
    try {
      input.addData((1L, nearDup))
      q.processAllAvailable()
      input.addData((2L, nearDup))
      q.processAllAvailable()
    } finally q.stop()
    val once = spark.read.parquet(out)
      .select("doc_id", "corpus_id", "batch_id").collect().toSet
    assert(once.map(r => r.getLong(0)) == Set(1L, 2L))

    // Simulate the engine's failure semantics: foreachBatch replays the
    // last batch with the SAME batchId. Re-invoking the sink with
    // batch 1's content and id must leave the output set unchanged.
    val replayBatch = graft.operators.Dedup.rowMinhashBands(
        Seq((2L, nearDup)).toDF("doc_id", "text"))
      .join(graft.operators.Dedup.minhashBands(corpus)
        .select(col("doc_id").as("corpus_id"), col("band"), col("bh")), Seq("band", "bh"))
      .select(col("doc_id"), col("corpus_id"))
    EventStreams.idempotentParquetSink(out)(replayBatch, 1L)
    val afterReplay = spark.read.parquet(out)
      .select("doc_id", "corpus_id", "batch_id").collect().toSet
    assert(afterReplay == once, "replaying a batch must not change the committed output")
  }

  test("attributePurchases: stream-stream join within the 1h window only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.attributePurchases(input.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(10), 7, "click", 0),     // within 1h of purchase
        Event(2, ts(100), 7, "click", 0),    // after purchase: no match
        Event(3, ts(5), 8, "click", 0),      // other user
        Event(4, ts(50), 7, "purchase", 9.99))
      q.processAllAvailable()
      val rows = spark.table("attribution")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((4L, 1L)))
    } finally q.stop()
  }

  test("dedupEvents: duplicate event_ids across batches are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(1), 1, "click", 0), Event(1, ts(1), 1, "click", 0))
      q.processAllAvailable()
      input.addData(Event(1, ts(2), 1, "click", 0), Event(2, ts(3), 1, "view", 0))
      q.processAllAvailable()
      val ids = spark.table("dedup_events").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize: 30-min gaps split sessions, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "click", 0),
        Event(2, ts(10), 7, "click", 0),  // same session
        Event(3, ts(50), 7, "click", 0))  // 40-min gap => new session
      q.processAllAvailable()
      input.addData(
        Event(4, ts(55), 7, "click", 0),  // continues session 2
        Event(5, ts(200), 7, "click", 0)) // new session 3 (state remembered)
      q.processAllAvailable()
      val last = spark.table("sessions").as[SessionUpdate].collect().last
      assert(last.user_id == 7L && last.n_sessions == 3L)
    } finally q.stop()
  }

  test("anomalyFlags: spike over rolling baseline flags, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.HourCount]
    val q = EventStreams.anomalyFlags(input.toDS(), window = 24)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: flat baseline, hours 0..5 at 10 events
      input.addData((0L to 5L).map(h => EventStreams.HourCount("A", h, 10L)): _*)
      q.processAllAvailable()
      // batch 2: the spike arrives later — state must remember baseline
      input.addData(EventStreams.HourCount("A", 6L, 30L),
        EventStreams.HourCount("B", 6L, 30L)) // B has no baseline
      q.processAllAvailable()
      val rows = spark.table("anomalies")
        .as[EventStreams.AnomalyFlag].collect()
        .map(f => (f.event_type, f.hour) -> f).toMap
      assert(rows(("A", 0L)).anomaly == 0 && rows(("A", 1L)).anomaly == 0,
        "warm-up hours cannot flag")
      assert(rows(("A", 6L)).anomaly == 1 && rows(("A", 6L)).n_obs == 6,
        "3x spike over flat cross-batch baseline flags")
      assert(rows(("B", 6L)).anomaly == 0, "no baseline, no flag")
    } finally q.stop()
  }
}
