package graft

import graft.operators.{Sampling, Similarity, Temporal, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the round-2 operators: hash-sampling
  * scores are stable fractions, stratified samples respect their caps,
  * the as-of result never postdates its probe, quantization preserves
  * self-similarity, and the rolling hash stays within its modulus.
  */
object Round2Props extends Properties("graft.round2") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private val ids = Gen.listOfN(25, Gen.chooseNum(0L, 100000L))

  property("hashScore is a stable fraction in [0,1) and key-deterministic") =
    forAll(ids) { xs: List[Long] =>
      import spark.implicits._
      val df = xs.toDF("id")
      val s1 = df.select(Sampling.hashScore(col("id")).as("s")).as[Double].collect()
      val s2 = df.select(Sampling.hashScore(col("id")).as("s")).as[Double].collect()
      s1.sameElements(s2) && s1.forall(s => s >= 0.0 && s < 1.0)
    }

  property("stratifiedSample returns at most n per stratum and only input rows") =
    forAll(ids, Gen.chooseNum(1, 5)) { (xs: List[Long], n: Int) =>
      import spark.implicits._
      val df = xs.toDF("key").withColumn("stratum", pmod(col("key"), lit(3)))
      val out = Sampling.stratifiedSample(df, col("stratum"), col("key"), n)
      val counts = out.groupBy("stratum").count().as[(Long, Long)].collect()
      counts.forall(_._2 <= n) &&
        out.select("key").as[Long].collect().toSet.subsetOf(xs.toSet)
    }

  property("asOfJoin: attached sec is never after the probe and comes from the left set") =
    forAll(ids, ids) { (ls: List[Long], rs: List[Long]) =>
      import spark.implicits._
      val left = ls.map(s => (s % 5, s)).toDF("k", "sec")
      val right = rs.zipWithIndex.map { case (s, i) => (s % 5, i.toLong, s) }
        .toDF("k", "rid", "p_sec")
      val out = Temporal.asOfJoin(left, right, "k", "sec", "p_sec")
        .select("p_sec", "asof_sec").as[(Long, Option[Long])].collect()
      out.forall { case (p, a) => a.forall(x => x <= p && ls.contains(x)) }
    }

  property("int8 quantization keeps self-similarity exactly 1 for nonzero vectors") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-100, 100).suchThat(_ != 0))) { vs: List[Int] =>
      import spark.implicits._
      val emb = Seq((0L, vs.map(_.toFloat)), (1L, vs.map(_.toFloat)))
        .toDF("vec_id", "embedding")
      val top = Similarity.quantizedTopK(emb, nQueries = 2, k = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      top == Map(0L -> 1L, 1L -> 0L)
    }

  property("rolling hash stays within the modulus and is text-deterministic") =
    forAll(Gen.listOfN(10, Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString))) { ws: List[String] =>
      import spark.implicits._
      val df = Seq(ws.mkString(" ")).toDF("text")
      val h1 = df.select(TextAnalysis.rollingHash(col("text"))).as[Long].head()
      val h2 = df.select(TextAnalysis.rollingHash(col("text"))).as[Long].head()
      h1 == h2 && h1 >= 0L && h1 < 1000000000000000L
    }

  // fast default profile (r22): full sweep depth via
  // -Dgraft.props.trials=full — see graft.TestProfile
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(100, 20))
}
