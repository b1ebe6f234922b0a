package graft

import graft.core.{Harmonize, Ids}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.1): dense ids are a
  * permutation of 1..n ordered by the sort key; dedup is idempotent;
  * harmonize always yields exactly the target schema.
  */
object CoreProps extends Properties("graft.core") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
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

  // random 4-12 doc corpora over a 6-word vocabulary: dense shingle
  // collisions, many exact ties — the adversarial regime for pair
  // scoring
  private val docsGen: Gen[List[String]] =
    Gen.chooseNum(4, 12).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(5, 10).flatMap { len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
          .map(_.mkString(" "))
      })
    }

  private def shingleSet(text: String): Set[String] = {
    val w = text.trim.split("\\s+").toSeq
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  property("jaccard/containment pairs match an independent brute force") =
    forAll(docsGen) { texts: List[String] =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sh = graft.operators.Dedup.shingles(docs)
      val gotJ = graft.operators.Dedup.jaccardPairs(sh, 0.3)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val gotC = graft.operators.Dedup.containmentPairs(sh, 0.3)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      val sets = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t) }
      val expected = for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        common = (sa & sb).size
        if common > 0
      } yield (ia, ib, common.toDouble / (sa.size + sb.size - common),
        common.toDouble / math.min(sa.size, sb.size))
      val expJ = expected.collect { case (a, b, j, _) if j >= 0.3 => (a, b) -> j }.toMap
      val expC = expected.collect { case (a, b, _, c) if c >= 0.3 => (a, b) -> c }.toMap
      gotJ == expJ && gotC == expC &&
        // containment dominates jaccard on every candidate pair
        expected.forall { case (_, _, j, c) => c >= j }
    }

  property("globalCumsum equals the single-partition window on any partitioning") =
    forAll(smallInts, Gen.chooseNum(1, 8)) { (xs: List[Int], parts: Int) =>
      import spark.implicits._
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, math.abs(v).toLong) }
        .toDF("k", "w").repartition(parts)
      val got = graft.core.Cumsum.globalCumsum(df, Seq(col("k")), col("w"))
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
      val exp = xs.map(v => math.abs(v).toLong).scanLeft(0L)(_ + _).tail
      got.map(_._2).toSeq == exp
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

  // fast default profile (r22): full sweep depth via
  // -Dgraft.props.trials=full — see graft.TestProfile
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(100, 30))
}
