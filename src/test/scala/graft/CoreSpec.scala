package graft

import graft.core.{Audit, Harmonize, Ids}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class HarmonizeSpec extends SparkSpec {
  import spark.implicits._

  test("harmonize pads missing columns with typed nulls in declared order") {
    val df = Seq((1, "a")).toDF("id", "name")
    val target = StructType(Seq(
      StructField("name", StringType),
      StructField("id", LongType),
      StructField("extra", DoubleType)))
    val out = Harmonize.harmonize(df, target)
    assert(out.columns.toSeq == Seq("name", "id", "extra"))
    assert(out.schema("id").dataType == LongType)
    val r = out.head()
    assert(r.getString(0) == "a" && r.getLong(1) == 1L && r.isNullAt(2))
  }

  test("float->string coercion renders whole floats without decimals (utilities.py:41-46)") {
    val df = Seq((Some(5757.0), 1), (Some(2.5), 2), (None: Option[Double], 3)).toDF("v", "id")
    val target = StructType(Seq(StructField("v", StringType)))
    val out = Harmonize.harmonize(df, target).as[Option[String]].collect().toSet
    assert(out == Set(Some("5757"), Some("2.5"), None))
  }

  test("float->string coercion survives whole doubles beyond Long range (ANSI overflow guard)") {
    val df = Seq(Some(1e20), Some(-1e20), Some(5757.0), None: Option[Double]).toDF("v")
    val target = StructType(Seq(StructField("v", StringType)))
    val out = Harmonize.harmonize(df, target).as[Option[String]].collect().toSet
    // out-of-range whole doubles fall back to double rendering instead
    // of throwing CAST_OVERFLOW under Spark 4 ANSI mode
    assert(out == Set(Some("1.0E20"), Some("-1.0E20"), Some("5757"), None))
  }

  test("dropAllNullColumns drops only fully-null columns") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
      .withColumn("empty", lit(null).cast(StringType))
      .withColumn("partial", when(col("id") === 1, "x"))
    val out = Harmonize.dropAllNullColumns(df)
    assert(out.columns.toSet == Set("id", "name", "partial"))
  }
}

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("denseId assigns dense 1..n in sort order across partitions") {
    val df = spark.range(1000).select((lit(1000) - col("id")).as("key"))
      .repartition(7)
    val out = Ids.denseId(df, Seq(col("key"))).collect()
    assert(out.length == 1000)
    val byId = out.sortBy(_.getLong(0))
    assert(byId.head.getLong(0) == 1L && byId.last.getLong(0) == 1000L)
    // id order == key order
    assert(byId.map(_.getLong(1)).toSeq == (1L to 1000L))
  }

  test("denseIdWindow matches denseId on the same input") {
    val df = Seq("c", "a", "b").toDF("k")
    val a = Ids.denseId(df, Seq(col("k"))).select("id", "k").as[(Long, String)].collect().toSet
    val b = Ids.denseIdWindow(df, Seq(col("k"))).select("id", "k").as[(Long, String)].collect().toSet
    assert(a == b && a == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("mapForeignKey maps matched keys, reports and drops unmatched (combine_pset_tables.py:319-326)") {
    val fact = Seq(("x", 1), ("y", 2), ("zz", 3)).toDF("tissue", "val")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("id", "name")
    val m = Audit.mapForeignKey(fact, dim, "tissue", outCol = "tissue_id")
    assert(m.unmatched.as[String].collect().toSeq == Seq("zz"))
    val rows = m.mapped.select("val", "tissue_id").as[(Int, Long)].collect().toSet
    assert(rows == Set((1, 10L), (2, 20L)))
  }
}

/** S1 evidence: the reference's primary input is a single `.csv.gz`
  * file per table (read_pset.py:69-72, 80-81). Spark must read such a
  * file transparently by extension — no decompression step. */
class CsvGzSpec extends SparkSpec {
  import spark.implicits._

  test("single .csv.gz file scans transparently with header + schema") {
    val dir = java.nio.file.Files.createTempDirectory("csvgz")
    val f = dir.resolve("cells.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(f))
    out.write("name,tissue,n\nc1,lung,3\nc2,breast,NA\n".getBytes("UTF-8"))
    out.close()
    val df = spark.read.option("header", "true").option("nullValue", "NA")
      .csv(f.toString)
    val rows = df.select("name", "tissue", "n").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSet == Set(("c1", "lung", Some("3")), ("c2", "breast", None)))
  }
}
