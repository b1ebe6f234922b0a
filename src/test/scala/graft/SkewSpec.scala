package graft

import graft.core.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 9000 of 10000 rows share key 1
    val fact = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("key"),
        col("id").as("payload"))
    val dim = Seq((1L, "hot"), (9500L, "cold")).toDF("key", "label")
    val plain = fact.join(dim, Seq("key")).select("payload", "label")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", 8, Seq(col("payload")))
      .select("payload", "label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._2 == "hot") == 9000)
  }

  test("salt is deterministic and bounded") {
    val s = spark.range(100).select(Skew.salt(8, col("id")).as("s"))
      .as[Int].collect()
    assert(s.forall(v => v >= 0 && v < 8))
    val s2 = spark.range(100).select(Skew.salt(8, col("id")).as("s"))
      .as[Int].collect()
    assert(s.toSeq == s2.toSeq)
  }

  test("AQE skew-join splits the hot partition of the range-join shuffle (task-size evidence)") {
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
    // Division of labor on the temporal joins: asOfJoin is a WINDOW
    // (zero joins), and AQE's skew optimization only splits joins —
    // a window partition is indivisible, so salting stays the manual
    // tool there (Soak's asof_join_skewed shows the merge pass is
    // linear even with a 25%-hot user). rangeCountJoin's candidate
    // stage IS a sort-merge equi-join, so a hot (user, bucket) key is
    // exactly what AQE can repair at runtime — this test proves it
    // does, with per-split sizes as the before/after evidence.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // the split would normally be skipped when a downstream agg wants
    // the join's partitioning; force it, as a production job with a
    // hot key would
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // hot user 0 owns 200k clicks in ONE time bucket; 100 cold users
    // share 2k. 10 hot-user purchases keep the candidate fan-out sane.
    val clicks = s.range(200000)
      .select(lit(0L).as("user_id"), (col("id") % 3000).as("sec"))
      .union(s.range(2000).select(col("id") % 100 + 1, col("id") % 3000))
    val purchases = s.range(1000)
      .select(when(col("id") < 10, 0L).otherwise(col("id") % 100 + 1).as("user_id"),
        col("id").as("event_id"), (col("id") % 3000).as("p_sec"))
    val out = graft.operators.Temporal.rangeCountJoin(
      clicks, purchases, "user_id", "sec", "p_sec", 3600L)
    // collect() (not count()) so THIS Dataset's QueryExecution is the
    // one that runs — count() spawns a separate pruned execution and
    // out.queryExecution would still hold the unexecuted initial plan
    assert(out.collect().length == 1000) // zero-match rows preserved
    val finalPlan = out.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.get
    // materialized stages are LEAVES of the final plan — recurse into
    // each QueryStageExec's plan or the skewed reads stay invisible
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def reads(p: SparkPlan): Seq[AQEShuffleReadExec] =
      p.collect { case r: AQEShuffleReadExec => r } ++
        p.collect { case q: QueryStageExec => q }.flatMap(q => reads(q.plan))
    val splits = reads(finalPlan)
      .flatMap(_.partitionSpecs)
      .collect { case p: PartialReducerPartitionSpec => p }
    assert(splits.nonEmpty, "AQE must have split at least one skewed partition")
    // before/after: the hot reducer's TOTAL bytes (what one task would
    // have read) vs the largest single split it now reads
    val byReducer = splits.groupBy(_.reducerIndex).values.map { ps =>
      (ps.map(_.dataSize).sum, ps.map(_.dataSize).max, ps.size)
    }
    byReducer.foreach { case (total, maxSplit, n) =>
      info(f"hot reducer: $total%,d B in 1 task -> $n splits, largest $maxSplit%,d B")
      assert(n > 1 && maxSplit < total,
        s"split must shrink the straggler task ($n splits, max $maxSplit of $total)")
    }
  }
}
