package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Executable example: stream the driver's events table through the
  * windowed-aggregate pipeline using a real file source (readStream
  * over parquet), print the aggregated windows. Run with
  * `sbt "runMain graft.streaming.StreamingDemo [sfDir]"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.ts is TIMESTAMP(NANOS) parquet — read as nanos (LongType)
    // and convert; see graft.core.Tables.t
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // file-source streams watch a directory (files arrive over time);
    // stage the single driver file into one
    val watchDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      watchDir.resolve("events-000.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_demo")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    val out = spark.table("hourly_demo").orderBy("hour", "event_type")
    println("STREAM_ROWS=" + out.count())
    out.show(10, truncate = false)
    println("STREAMING_DEMO_OK")
    q.stop()
    spark.stop()
  }
}
