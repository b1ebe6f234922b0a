package graft

import graft.core.{Ids, Materialize}
import graft.operators.{Dedup, Temporal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The session-wide reliable-materialization knob: every in-query pin
  * (Materialize.pin and the canonicalClusters loop) switches from
  * executor-memory localCheckpoint to checkpoint-dir-backed
  * checkpoint, with identical query output. Conf is session-scoped, so
  * the reliable session is a newSession() child — the shared spec
  * session never sees the knob. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def reliableSession(): SparkSession = {
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("mat-ckpt").toString)
    val s = spark.newSession()
    s.conf.set(Materialize.ReliableConf, "true")
    s
  }

  test("reliable mode without a checkpoint dir fails fast with a clear message") {
    // only provable while no dir is set on the shared context (another
    // suite may have set one first — then the guard cannot trip)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val s = spark.newSession()
      s.conf.set(Materialize.ReliableConf, "true")
      val df = s.range(3).toDF("id")
      val e = intercept[IllegalArgumentException](Materialize.pin(df))
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  test("denseId output is identical under local and reliable pins") {
    val rs = reliableSession()
    def run(s: SparkSession) = {
      val df = s.createDataFrame(Seq(("c", 3), ("a", 1), ("b", 2), ("a", 0)))
        .toDF("k", "v")
      Ids.denseId(df, Seq(col("k"), col("v")))
        .select("k", "v", "id").as[(String, Int, Long)](
          org.apache.spark.sql.Encoders.product[(String, Int, Long)])
        .collect().toSet
    }
    assert(run(rs) == run(spark))
  }

  test("rangeCountJoin and minhashLsh outputs are identical under reliable pins") {
    val rs = reliableSession()
    def runTemporal(s: SparkSession) = {
      val clicks = s.createDataFrame(Seq((1L, 10L), (1L, 50L), (2L, 5L)))
        .toDF("user_id", "sec")
      val buys = s.createDataFrame(Seq((1L, 60L, 100L), (2L, 61L, 4L)))
        .toDF("user_id", "event_id", "p_sec")
      Temporal.rangeCountJoin(clicks, buys, "user_id", "sec", "p_sec", 55L)
        .select("user_id", "event_id", "n_in_range")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(runTemporal(rs) == runTemporal(spark))
    def runLsh(s: SparkSession) = {
      val base = (1 to 40).map(i => s"tok$i").mkString(" ")
      val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " o1 o2"
      val d = s.createDataFrame(Seq((1L, base), (2L, near))).toDF("doc_id", "text")
      Dedup.minhashLsh(d, 0.5).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(runLsh(rs) == runLsh(spark) && runLsh(spark) == Set((1L, 2L)))
  }

  test("canonicalClusters picks up the session conf without the explicit param") {
    val rs = reliableSession()
    val edges = rs.createDataFrame(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      .toDF("doc_a", "doc_b")
    val c = Dedup.canonicalClusters(edges) // reliable via conf, not param
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
