package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partitioned sinks + partition pruning — the layout decision that
  * matters most at 100 TB: a filter on the partition column must
  * prune directories at planning time (PartitionFilters), not scan
  * and discard.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on partition column prunes partitions in the scan") {
    val dir = Files.createTempDirectory("part-prune").toString
    spark.range(10000)
      .select(col("id"), (col("id") % 10).as("dataset_id"))
      .write.mode("overwrite").partitionBy("dataset_id").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("dataset_id") === 3)
    assert(q.count() == 1000)

    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("dataset_id"),
      s"expected partition filters in scan:\n$scan")
    // pruned scan reads only the matching directory
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.forall(_.contains("dataset_id=3")))
  }
}
