package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata layout (TESTDATA.md): one parquet
  * file per table under a scale-factor directory.
  *
  * At 100 TB each of these would be a partitioned/bucketed parquet
  * dataset; `spark.read.parquet` on a directory is the same code path,
  * so nothing here changes at scale — partition pruning and predicate
  * pushdown happen in the scan Spark plans on top of these.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos (LongType) and do integer
      // nano arithmetic downstream (exact — double would lose precision
      // above 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
