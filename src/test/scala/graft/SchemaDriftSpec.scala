package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Regression spec for testdata schema drift on `events.ts`.
  *
  * The driver has shipped events.parquet with (at least) two physical
  * encodings of `ts` across testdata generations:
  *   - parquet TIMESTAMP(NANOS) — Spark only reads it as raw int64 via
  *     spark.sql.legacy.parquet.nanosAsLong (plain-int64 stand-in here:
  *     same read path, LongType arrives at `Tables.normalizeTsNanos`);
  *   - timestamp[us] with isAdjustedToUTC=false — Spark reads it as
  *     TIMESTAMP_NTZ.
  * `Tables.t` must yield identical int64 epoch-nanoseconds for both, so
  * the ~37 downstream nano-arithmetic sites never see the encoding.
  */
class SchemaDriftSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"schema-drift-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("Tables.t yields identical nanos-Long ts for int64-nanos and timestamp[us] encodings") {
    import spark.implicits._
    // 2021-03-04T05:06:07 UTC and a second-boundary edge, as epoch nanos
    val nanos = Seq(1614834367000000000L, 1614834368000000000L, 0L)
    val base = nanos.zipWithIndex
      .map { case (n, i) => (i.toLong, n, i.toLong % 2, s"e$i", i.toDouble, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // Encoding A: int64 nanos (the nanosAsLong read path's output shape)
    val dirA = tmpDir("nanos")
    base.write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // Encoding B: timestamp[us] / TIMESTAMP_NTZ (current testdata shape)
    val dirB = tmpDir("micros")
    base
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    val a = Tables.t(spark, dirA, "events")
    val b = Tables.t(spark, dirB, "events")

    assert(a.schema("ts").dataType == LongType)
    assert(b.schema("ts").dataType == LongType)

    val rowsA = a.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val rowsB = b.orderBy("event_id").select("event_id", "ts").collect().toSeq
    assert(rowsA == rowsB)
    assert(rowsA.map(_.getLong(1)) == nanos) // exact values survive, in event_id order
  }

  test("tsToNanos is exact at microsecond precision") {
    import spark.implicits._
    val micros = Seq(0L, 1L, 999999L, 1614834367123456L, -1L)
    val got = micros.toDF("us")
      .select(Tables.tsToNanos(timestamp_micros($"us")).as("ns"))
      .orderBy("ns").as[Long].collect().toSeq
    assert(got == micros.map(_ * 1000L).sorted)
  }
}
