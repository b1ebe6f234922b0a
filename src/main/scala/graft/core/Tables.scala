package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
      // events.ts has shipped as two physical encodings across testdata
      // generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
      // reader only accepts as raw int64 via nanosAsLong) and
      // timestamp[us] (read as TIMESTAMP_NTZ). Keep the flag so the
      // nanos encoding still reads, then normalize whatever arrived to
      // integer nanoseconds — downstream operators do exact integer
      // nano arithmetic (double would lose precision above 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTsNanos(spark.read.parquet(s"$dir/$name.parquet"))
    } else if (name == "embeddings") {
      normalizeEmbedding(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Normalize the embeddings frame so `embedding` is `array<float>` —
    * the element type the native kernels (CosineSimilarity,
    * SignBuckets) are compiled against. A regenerated testdata (or a
    * mixed-producer parquet forest at scale) shipping `array<double>`
    * would otherwise fail analysis at every vector op — the same drift
    * class the `events.ts` encoding change hit in r10, guarded at the
    * same read chokepoint. Float-to-float is a no-op; the cast is
    * per-element column math inside codegen. */
  def normalizeEmbedding(df: DataFrame): DataFrame =
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(_, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding must be an array type, got $other")
    }

  /** Normalize an events frame so `ts` is integer nanoseconds since the
    * epoch (LongType), independent of the parquet encoding it was read
    * from. Timestamp encodings are microsecond-precision in Spark, so
    * `unix_micros * 1000` is exact; TIMESTAMP_NTZ wall-clock values are
    * interpreted in the session timezone (UTC in all our entry points),
    * matching DuckDB's `epoch(ts)` on the same file. Pure column math —
    * stays inside whole-stage codegen, no shuffle, no UDF.
    */
  def normalizeTsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case _        => df.withColumn("ts", tsToNanos(col("ts")))
    }

  /** Column expression converting any timestamp-typed column to int64
    * epoch nanoseconds. Exposed for streaming sources where the schema
    * is declared up front rather than inferred.
    */
  def tsToNanos(c: Column): Column =
    unix_micros(c.cast(TimestampType)) * lit(1000L)

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
