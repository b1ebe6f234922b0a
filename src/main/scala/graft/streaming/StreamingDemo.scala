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
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.ts ships as either TIMESTAMP(NANOS) (read as int64 nanos
    // via nanosAsLong) or timestamp[us]; take the file's actual schema
    // for the stream, then normalize to nanos — see graft.core.Tables
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // file-source streams watch a directory (files arrive over time);
    // stage the single driver file into one
    val watchDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      watchDir.resolve("events-000.parquet"))
    val raw = spark.readStream.schema(schema).parquet(watchDir.toString)
    val nanos =
      if (schema("ts").dataType == LongType) raw
      else raw.withColumn("ts", graft.core.Tables.tsToNanos(col("ts")))
    val stream = nanos
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
