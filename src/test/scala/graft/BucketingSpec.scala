package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB strategy for repeated
  * fact-fact joins on the same key (SURVEY §7, "pre-partitioning"):
  * both sides bucketed on the join key produce a SortMergeJoin with
  * ZERO Exchange operators. Exercises the Layout.bucketedWrite /
  * bucketedJoin surface the x_layout_bucketed_join gate query rides.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans without shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    val root = java.nio.file.Files.createTempDirectory("bucketing-spec").toString
    Layout.bucketedWrite(
      spark.range(10000).select(col("id").as("key"), (col("id") * 2).as("a")),
      "graft_bucket_a", "key", 4, s"$root/a")
    Layout.bucketedWrite(
      spark.range(10000).select(col("id").as("key"), (col("id") * 3).as("b")),
      "graft_bucket_b", "key", 4, s"$root/b")

    val joined = Layout.bucketedJoin(spark, "graft_bucket_a", "graft_bucket_b", "key")
      .agg(count(lit(1)).as("n"))
    assert(joined.head().getLong(0) == 10000L)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle, got:\n$plan")

    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
  }
}
