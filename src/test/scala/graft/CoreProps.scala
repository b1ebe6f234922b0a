package graft

import graft.core.{Harmonize, Ids}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.1): dense ids are a
  * permutation of 1..n ordered by the sort key; dedup is idempotent;
  * harmonize always yields exactly the target schema.
  */
object CoreProps extends Properties("graft.core") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val smallInts = Gen.listOfN(30, Gen.chooseNum(-1000, 1000))

  property("denseId assigns a 1..n permutation ordered by key") =
    forAll(smallInts) { xs: List[Int] =>
      import spark.implicits._
      val df = xs.toDF("v").repartition(3)
      val out = Ids.denseId(df, Seq(col("v")))
        .select("id", "v").as[(Long, Int)].collect().sortBy(_._1)
      out.map(_._1).toSeq == (1L to xs.length) &&
        out.map(_._2).toSeq == xs.sorted
    }

  property("dropDuplicates is idempotent") =
    forAll(smallInts) { xs: List[Int] =>
      import spark.implicits._
      val once = xs.toDF("v").dropDuplicates()
      once.dropDuplicates().count() == once.count() &&
        once.count() == xs.distinct.length
    }

  property("union + distinct equals set union") =
    forAll(smallInts, smallInts) { (a: List[Int], b: List[Int]) =>
      import spark.implicits._
      val u = a.toDF("v").union(b.toDF("v")).distinct()
        .as[Int].collect().toSet
      u == (a.toSet ++ b.toSet)
    }

  property("harmonize output schema is exactly the target") =
    forAll(Gen.someOf("a", "b", "c")) { present =>
      import spark.implicits._
      val df = present.foldLeft(Seq(1).toDF("seed")) { (d, c) =>
        d.withColumn(c, lit(1.0))
      }
      val target = StructType(Seq(
        StructField("a", StringType), StructField("b", DoubleType),
        StructField("c", LongType)))
      val out = Harmonize.harmonize(df, target)
      out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq("a" -> StringType, "b" -> DoubleType, "c" -> LongType)
    }
}
