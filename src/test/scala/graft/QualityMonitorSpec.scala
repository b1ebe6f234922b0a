package graft

import graft.streaming.QualityMonitor
import graft.streaming.QualityMonitor.Doc
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("windowedQuality: per-window per-source metrics, state split by window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = QualityMonitor.windowedQuality(input.toDF())
      .writeStream.format("memory").queryName("wq")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Doc(1, ts(10), "crawl", "hello world"),   // 11 chars
        Doc(2, ts(20), "crawl", "   "),           // whitespace-only: empty
        Doc(3, ts(30), "crawl", "café"),     // non-ascii
        Doc(4, ts(70), "crawl", "second window"),
        Doc(5, ts(15), "api", null))              // null text: empty
      q.processAllAvailable()
      val rows = spark.table("wq")
        .select("source", "n_docs", "n_empty", "n_chars", "n_nonascii")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(rows == Set(
        ("crawl", 3L, 1L, 18L, 1L),   // 11 + 3 + 4 chars
        ("crawl", 1L, 0L, 13L, 0L),
        ("api", 1L, 1L, 0L, 0L)))
    } finally q.stop()
  }

  test("qualityDrift: baseline join flags drifted windows and new sources") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: crawl docs average 10 chars, no empties, no non-ascii
    val baseline = QualityMonitor.baselineProfile(Seq(
      Doc(100, ts(0), "crawl", "0123456789"),
      Doc(101, ts(0), "crawl", "0123456789")).toDF())
    assert(baseline.as[(String, Long, Long, Long)].collect().toSeq ==
      Seq(("crawl", 100000L, 0L, 0L)))
    val input = MemoryStream[Doc]
    val q = QualityMonitor.qualityDrift(input.toDF(), baseline)
      .writeStream.format("memory").queryName("qd")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Doc(1, ts(10), "crawl", "0123456789"),  // on-baseline
        Doc(2, ts(70), "crawl", "xx"),          // 5x shorter: len drift
        Doc(3, ts(10), "wild", "?"))            // unseen source: all flags
      q.processAllAvailable()
      val rows = spark.table("qd")
        .select("source", "n_docs", "drift_len", "drift_empty", "drift_nonascii")
        .as[(String, Long, Boolean, Boolean, Boolean)].collect().toSet
      assert(rows == Set(
        ("crawl", 1L, false, false, false),
        ("crawl", 1L, true, false, false),
        ("wild", 1L, true, true, true)))
    } finally q.stop()
  }

  test("qualityDrift: batch replay of the same data yields identical bp values") {
    // integer-bp determinism: run the same rows through the BATCH
    // windowedQuality plan (streaming and batch share the transform)
    val docs = Seq(
      Doc(1, ts(1), "a", "abcdefg"),
      Doc(2, ts(2), "a", "hij"),
      Doc(3, ts(3), "a", "")).toDF()
    val base = QualityMonitor.baselineProfile(docs)
    val out1 = QualityMonitor.qualityDrift(docs, base)
    val out2 = QualityMonitor.qualityDrift(docs, base)
    assert(out1.collect().toSet == out2.collect().toSet)
    val r = out1.select("len_bp", "empty_bp").as[(Long, Long)].head()
    assert(r == ((50000L, 3333L)))   // 10 chars / 2 non-empty, 1/3 empty
  }

  test("pathTransitions: state carries the last event across batches") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Event
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.pathTransitions(input.toDS())
      .writeStream.format("memory").queryName("paths")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "b", 0),
        Event(3, ts(0), 2, "x", 0))
      q.processAllAvailable()
      // batch 2: user 1 continues within gap (b>c), then re-sessions
      // after 90 min (^>a); user 2's state also survives the batch gap
      input.addData(
        Event(4, ts(20), 1, "c", 0), Event(5, ts(115), 1, "a", 0),
        Event(6, ts(5), 2, "y", 0))
      q.processAllAvailable()
      val got = spark.table("paths")
        .select("from_type", "to_type").as[(String, String)]
        .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(got == Map(
        ("^", "a") -> 2L, ("a", "b") -> 1L, ("b", "c") -> 1L,
        ("^", "x") -> 1L, ("x", "y") -> 1L))
      // shared-semantics invariant with the batch op: every event is
      // the target of exactly one transition
      assert(spark.table("paths").count() == 6L)
    } finally q.stop()
  }

  test("funnelProgress: strict chain, cross-batch state, equals the batch funnel on ordered prefixes") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Event
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[Event]
    val q = EventStreams.funnelProgress(input.toDS(), steps)
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    val fed = scala.collection.mutable.ArrayBuffer.empty[Event]
    def feed(evs: Event*): Unit = {
      input.addData(evs); fed ++= evs; q.processAllAvailable()
    }
    try {
      // u1 advances two stages in batch 1; u2's purchase precedes its
      // view (no lookback); u3 clicks at the SAME ms as its view
      // (strict > : does not advance)
      feed(
        Event(1, ts(0), 1, "view", 0), Event(2, ts(1), 1, "click", 0),
        Event(3, ts(0), 2, "purchase", 0), Event(4, ts(1), 2, "view", 0),
        Event(5, ts(0), 3, "view", 0), Event(6, ts(0), 3, "click", 0))
      // batch 2: u1 completes; u3's LATER click now advances it —
      // state carried the stage across the batch boundary
      feed(
        Event(7, ts(2), 1, "purchase", 0), Event(8, ts(1), 3, "click", 0))
      val maxStage = spark.table("funnel")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      assert(maxStage == Map(1L -> 3, 2L -> 1, 3L -> 2), s"got $maxStage")

      // streamed == batch over the event-time-ordered prefix: the
      // per-step counts must match Temporal.funnelSteps on the same rows
      val batchIn = fed.toSeq
        .map(e => (e.user_id, e.event_type, e.ts.getTime * 1000000L))
        .toDF("user_id", "event_type", "ts")
      val batchCounts = graft.operators.Temporal.funnelSteps(batchIn, steps)
        .select("step", "n_users").as[(Int, Long)].collect().toMap
      val streamCounts = (1 to steps.size).map(s =>
        s -> maxStage.values.count(_ >= s).toLong).toMap
      assert(streamCounts == batchCounts,
        s"stream $streamCounts vs batch $batchCounts")
    } finally q.stop()
  }

  test("windowedHeavyHitters: MG capture guarantee holds across batch merges") {
    implicit val sqlCtx = spark.sqlContext
    val k = 4
    // window 0: 'dup' floods (far above N/(k+1)) amid a tail domain
    // wider than k, split across TWO batches so the state store must
    // merge partial summaries; window 1: a different dominant token
    def doc(id: Long, min: Long, text: String) = Doc(id, ts(min), "crawl", text)
    val input = MemoryStream[Doc]
    val q = QualityMonitor.windowedHeavyHitters(input.toDF(), k = k)
      .writeStream.format("memory").queryName("whh")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        doc(1, 5, "dup dup dup dup t1 t2"),
        doc(2, 10, "dup dup dup t3 t4"))
      q.processAllAvailable()
      input.addData(
        doc(3, 20, "dup dup dup t5 t6 t7"),
        doc(4, 70, "other other other t8"))
      q.processAllAvailable()
      val rows = spark.table("whh")
        .select("window_start", "n_toks", "candidates")
        .as[(Timestamp, Long, Map[String, Long])].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap // last update per window
      val w0 = rows(new Timestamp(0L)); val w1 = rows(new Timestamp(3600000L))
      assert(w0._2 == 17L && w0._3.contains("dup"),
        s"window-0 flood token must survive the summary: $w0")
      assert(w0._3.size <= k, "state is bounded by k counters")
      assert(w0._3("dup") <= 10L && w0._3("dup") >= 10L - 17L / (k + 1) - 1,
        "counter under-counts within the MG bound")
      assert(w1._2 == 4L && w1._3.contains("other"), s"window 1: $w1")
    } finally q.stop()
  }
}
