package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query micro-bench: runs each named query twice (cold +
  * warm) against SPARK_GRAFT_SF_DIR through the noop sink, so a single
  * operator can be measured without the full Bench run's noise.
  * `sbt "runMain graft.TimeQuery x_dedup_clusters q0_spine"`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- args; run <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"TIME $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
