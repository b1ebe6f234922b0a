package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession

/** One-off cross-check: at the gate SF, the LSH-wired curation must
  * equal the exact-pairs wiring row-for-row. Kept as a runMain (not a
  * spec) because sf0.01 is too slow for the routine test suite. */
object CheckCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val lsh = Curation.curate(docs).collect().map(_.toString).sorted.toSeq
    val exact = Curation.curate(docs, nearDupPairs = Curation.exactPairs)
      .collect().map(_.toString).sorted.toSeq
    println(s"CHECK rows lsh=${lsh.size} exact=${exact.size} equal=${lsh == exact}")
    spark.stop()
  }
}
