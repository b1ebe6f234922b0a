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

  test("Tables.t casts a drifted array<double> embedding back to array<float>") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0.25f, -1.5f, 3.0f)),
      (1L, Seq(1.0f, 2.0f, -0.5f)))
    val dirF = tmpDir("emb-float")
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dirF/embeddings.parquet")
    val dirD = tmpDir("emb-double")
    vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")

    val f = Tables.t(spark, dirF, "embeddings")
    val d = Tables.t(spark, dirD, "embeddings")
    assert(f.schema("embedding").dataType == ArrayType(FloatType))
    assert(d.schema("embedding").dataType == ArrayType(FloatType))
    // the values above are exactly float-representable, so the
    // double round-trip is lossless and the native kernel agrees
    import graft.functions.CosineSimilarity.cosineSim
    def sim(df: org.apache.spark.sql.DataFrame): Double = {
      val e = df.select(col("vec_id"), col("embedding"))
      e.filter(col("vec_id") === 0L)
        .crossJoin(e.filter(col("vec_id") === 1L)
          .select(col("embedding").as("other")))
        .select(cosineSim(col("embedding"), col("other")).as("s"))
        .as[Double].head()
    }
    assert(sim(f) == sim(d))
  }

  test("Tables.t yields exact nanos for TIMESTAMP_MILLIS and INT96 parquet encodings") {
    import spark.implicits._
    // a THIRD and FOURTH physical encoding the environment could ship
    // next (r11 verdict item 8): parquet TIMESTAMP(MILLIS) and the
    // legacy Hive INT96. Values are millis-precision (whole ms) so
    // every encoding represents them exactly; includes pre-epoch.
    val rnd = new scala.util.Random(7)
    val nanos = (Seq(0L, -123L, 1614834367000L, 1614834368123L) ++
      Seq.fill(40)(rnd.between(-4102444800000L, 4102444800000L)))
      .map(_ * 1000000L) // millis -> nanos
    val base = nanos.zipWithIndex
      .map { case (n, i) => (i.toLong, n, i.toLong % 2, s"e$i", i.toDouble, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def writeAs(outType: String): String = {
      val d = tmpDir(outType.toLowerCase)
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.get(key)
      spark.conf.set(key, outType)
      try base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      finally spark.conf.set(key, prev)
      d
    }
    for (enc <- Seq("TIMESTAMP_MILLIS", "INT96")) {
      val got = Tables.t(spark, writeAs(enc), "events")
      assert(got.schema("ts").dataType == LongType, s"encoding $enc")
      val rows = got.orderBy("event_id").select("ts").as[Long].collect().toSeq
      assert(rows == nanos, s"encoding $enc drifts through Tables.t")
    }
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
