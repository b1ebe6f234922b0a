package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The naive-range-join rewrite must change the PLAN (nested-loop ->
  * equi-join) without changing the RESULT (exact multiset, verified
  * against the un-rewritten session). */
class RangeJoinRewriteSpec extends SparkSpec {

  private def frames(s: SparkSession) = {
    val clicks = s.range(2000).select(
      (col("id") * 37 % 5000).as("c_sec"), col("id").as("click_id"))
    val purchases = s.range(300).select(
      (col("id") * 91 % 5000).as("p_sec"), col("id").as("purchase_id"))
    (clicks, purchases)
  }

  private def naiveJoin(s: SparkSession) = {
    val (clicks, purchases) = frames(s)
    clicks.join(purchases,
      col("c_sec") > col("p_sec") - 600 && col("c_sec") <= col("p_sec"))
      .select("click_id", "purchase_id")
  }

  test("pure-inequality range join rewrites to an equi-join with identical results") {
    val plain = spark.newSession()
    val opt = spark.newSession()
    opt.experimental.extraOptimizations = Seq(RangeJoinRewrite)

    val before = naiveJoin(plain).queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"),
      "without the rule the pure-inequality join must be a nested loop")

    val after = naiveJoin(opt).queryExecution.executedPlan.toString
    assert(!after.contains("BroadcastNestedLoopJoin"),
      "the rule must remove the nested loop")
    assert(after.contains("SortMergeJoin") || after.contains("ShuffledHashJoin")
      || after.contains("BroadcastHashJoin"),
      "the rewritten join must be an equi-join")

    val expected = naiveJoin(plain).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val actual = naiveJoin(opt).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(actual.sameElements(expected) && expected.nonEmpty)
  }

  test("joins that already have a cross-side equality are left alone") {
    val opt = spark.newSession()
    opt.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    val (clicks, purchases) = frames(opt)
    val keyed = clicks.withColumn("k", col("click_id") % 7)
      .join(purchases.withColumn("k2", col("purchase_id") % 7),
        col("k") === col("k2") &&
          col("c_sec") > col("p_sec") - 600 && col("c_sec") <= col("p_sec"))
    val plan = keyed.queryExecution.executedPlan.toString
    assert(!plan.contains("__rjr_b"), "equi-keyed range joins must not be rewritten")
  }

  test("inclusive lower bound (BETWEEN shape) is rewritten and exact") {
    val plain = spark.newSession()
    val opt = spark.newSession()
    opt.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    def q(s: SparkSession) = {
      val (clicks, purchases) = frames(s)
      clicks.join(purchases,
        col("c_sec") >= col("p_sec") - 600 && col("c_sec") < col("p_sec"))
        .select("click_id", "purchase_id")
    }
    assert(!q(opt).queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expected = q(plain).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val actual = q(opt).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(actual.sameElements(expected) && expected.nonEmpty)
  }
}
