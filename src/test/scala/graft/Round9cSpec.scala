package graft

import graft.operators.{Corpus, EventsOps}
import org.apache.spark.sql.functions._

/** Round-9 third batch: session-path analytics over the events table.
  */
class Round9cSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------- Session paths

  test("eventsPathBigrams: transitions respect session boundaries") {
    // user 1: a@0 b@10 [gap 2000s] c@2010 a@2015  -> ^>a a>b ^>c c>a
    // user 2: b@0                                  -> ^>b
    val rows = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 10L),
      (3L, 1L, "c", 2010L), (4L, 1L, "a", 2015L),
      (5L, 2L, "b", 0L))
    val df = rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    withEventsView(df) { d =>
      val out = EventsOps.eventsPathBigrams(spark, d)
        .as[(String, String, Long)].collect().toSeq
      assert(out == Seq(
        ("^", "a", 1L), ("^", "b", 1L), ("^", "c", 1L),
        ("a", "b", 1L), ("c", "a", 1L)))
    }
  }

  test("eventsPathTopk: path assembly is ordered and gap-split") {
    // user 1 session 1: a>b ; session 2: c ; user 2: a>b
    val rows = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 5L), (3L, 1L, "c", 5000L),
      (4L, 2L, "a", 0L), (5L, 2L, "b", 100L))
    val df = rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    withEventsView(df) { d =>
      val out = EventsOps.eventsPathTopk(spark, d)
        .as[(String, Long)].collect().toSeq
      assert(out == Seq(("a>b", 2L), ("c", 1L)))
    }
  }

  test("eventsPathBigrams: transition mass == events (gate data)") {
    // every event is the target of exactly one transition (real or ^)
    val total = EventsOps.eventsPathBigrams(spark, dir)
      .agg(sum("n")).as[Long].head()
    val nEvents = graft.core.Tables.t(spark, dir, "events").count()
    assert(total == nEvents)
    // and ^-mass == number of sessions from the sessionize op
    val caret = EventsOps.eventsPathBigrams(spark, dir)
      .filter(col("from_type") === "^").agg(sum("n")).as[Long].head()
    val sessions = EventsOps.eventsSessionize(spark, dir)
      .agg(sum("n_sessions")).as[Long].head()
    assert(caret == sessions)
  }

  // ----------------------------------------------- VocabCoverage

  test("coverageCurve: crossing points on a hand-built vocabulary") {
    // counts a=5 b=3 c=1 d=1 (total 10); cum = 5, 8, 9, 10
    val vocab = Seq(("a", 5L), ("b", 3L), ("c", 1L), ("d", 1L))
      .toDF("tok", "n_occ")
    val out = Corpus.coverageCurve(vocab)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (50L, 1L, 5L),    // 'a' alone covers exactly 50%
      (90L, 3L, 9L),    // a+b+c reach 90%
      (95L, 4L, 10L), (99L, 4L, 10L)))
  }

  // ------------------------------------------------ LabelPropagation

  test("labelPropagate: two triangles with a bridge, hand-traced rounds") {
    import graft.operators.Graph
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),     // triangle A
      (4L, 5L), (4L, 6L), (5L, 6L),     // triangle B
      (3L, 4L))                          // bridge
      .toDF("a", "b")
    // synchronous min-tie-break trace:
    // r1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    // r2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    val out = Graph.labelPropagate(edges, rounds = 2)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 3L), (6L, 3L)))
    // one round reproduces the first-step trace
    val r1 = Graph.labelPropagate(edges, rounds = 1)
      .as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 3L),
      (5L, 4L), (6L, 4L)))
  }

  test("labelPropagate: disconnected cliques resolve to their min ids") {
    import graft.operators.Graph
    val edges = Seq(
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("a", "b")
    val out = Graph.labelPropagate(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // within a clique, round 1 spreads near-min labels, round 2 makes
    // the min unanimous
    assert(out.filterKeys(Set(10L, 11L, 12L)).values.toSet == Set(10L))
    assert(out.filterKeys(Set(20L, 21L, 22L)).values.toSet == Set(20L))
  }

  // --------------------------------------------------- ResampleFfill

  test("resampleFfill: gap hours are zero-count with LOCF cents") {
    import graft.operators.Temporal
    // user 1: h=10 (2 events, 300c), gap 11-12, h=13 (100c)
    // user 2: single hour — spine is just that hour
    val e = Seq(
      (1L, 10L, 200L), (1L, 10L, 100L), (1L, 13L, 100L),
      (2L, 5L, 42L))
      .toDF("user_id", "h", "cents")
    val out = Temporal.resampleFfill(e)
      .orderBy("user_id", "h")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 2L, 300L), (1L, 11L, 0L, 300L), (1L, 12L, 0L, 300L),
      (1L, 13L, 1L, 100L),
      (2L, 5L, 1L, 42L)))
  }

  /** Write a synthetic events table to a temp dir so the (s, dir)
    * query contract can run against fixture rows. The events reader
    * expects nanos-long ts; timestamp parquet round-trips through
    * Tables.t's nanosAsLong handling only for TIMESTAMP(NANOS), so
    * write ts as the raw nanos long the reader produces. */
  private def withEventsView(df: org.apache.spark.sql.DataFrame)(
      f: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_events").toString
    df.withColumn("ts_nanos", (col("sec") * lit(1000000000L)).cast("long"))
      .drop("ts", "sec").withColumnRenamed("ts_nanos", "ts")
      .select("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    try f(tmp)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
