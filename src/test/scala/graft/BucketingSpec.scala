package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB strategy for repeated
  * fact-fact joins on the same key (SURVEY §7, "pre-partitioning"):
  * both sides bucketed on the join key produce a SortMergeJoin with
  * ZERO Exchange operators.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans without shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    spark.range(10000).select(col("id").as("key"), (col("id") * 2).as("a"))
      .write.bucketBy(4, "key").sortBy("key").saveAsTable("graft_bucket_a")
    spark.range(10000).select(col("id").as("key"), (col("id") * 3).as("b"))
      .write.bucketBy(4, "key").sortBy("key").saveAsTable("graft_bucket_b")

    val joined = spark.table("graft_bucket_a")
      .join(spark.table("graft_bucket_b"), Seq("key"))
      .agg(count(lit(1)).as("n"))
    assert(joined.head().getLong(0) == 10000L)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle, got:\n$plan")

    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
  }
}
