package graft

import org.apache.spark.sql.functions._

/** The streaming weighted reservoir must equal the batch A-ES draw
  * over the union of everything streamed — the invariant that makes
  * it a reservoir rather than an approximation: the race score is a
  * deterministic per-row function, so the running top-n IS the batch
  * top-n of the prefix. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  test("streaming reservoir == batch A-ES over the streamed prefix, at every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val n = 5
    val res = graft.streaming.SampleIngest.weightedReservoir(
      input.toDF().toDF("k", "w"), col("k"), col("w"), n)
    val q = res.writeStream.format("memory").queryName("reservoir")
      .outputMode("complete").start()
    try {
      val batches = Seq(
        (0L until 8L).map(k => (k, k % 3 + 1)),
        (8L until 20L).map(k => (k, 1000L)), // heavy batch shifts the sample
        (20L until 24L).map(k => (k, 1L)))
      var seen = Seq.empty[(Long, Long)]
      batches.foreach { b =>
        seen = seen ++ b
        input.addData(b: _*)
        q.processAllAvailable()
        val streaming = spark.table("reservoir")
          .select("k").as[Long].collect().toSet
        val batch = graft.operators.Sampling.weightedSampleNoReplace(
          seen.toDF("k", "w"), col("k"), col("w"), n)
          .select("k").as[Long].collect().toSet
        assert(streaming == batch,
          s"after ${seen.size} rows: streaming $streaming != batch $batch")
        assert(streaming.size == math.min(n, seen.size))
      }
    } finally q.stop()
  }

  test("reservoir state stays bounded: each partial carries <= n pairs") {
    // the batch-side twin of the state claim: the typed aggregation
    // partial-reduces to <= n pairs per task before the single-group
    // exchange — assert via the batch plan's partial aggregate node
    val rows = (0L until 1000L).map(k => (k, k % 7 + 1)).toDF("k", "w")
    val plan = graft.streaming.SampleIngest
      .weightedReservoir(rows, col("k"), col("w"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk"),
      s"reservoir must partial-aggregate map-side:\n$plan")
  }
}
