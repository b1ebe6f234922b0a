package graft

import graft.operators.{Corpus, Dedup, Sampling, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the round-14 operators.
  *
  * What each property actually pins (none is a tautology):
  *  - A-ES draws ride a float score ordering whose SET must still be
  *    an exact function of (keys, weights, n) — distinctness, size,
  *    and weight-monotone determinism on random corpora.
  *  - tokenBudgetFill's membership rule (start offset < B) has a
  *    MINIMAL-COVER characterization the implementation never states
  *    directly — selected total >= B when available, and dropping the
  *    boundary doc falls below B.
  *  - MatVecCentered is a hand-rolled codegen kernel; it must equal
  *    the obvious driver-side double loop on random matrices.
  *  - semanticPairs' multi-probe knob claims recall monotonicity —
  *    candidates at probes p+1 must be a superset of probes p, which
  *    holds by candidate-union construction but is exactly the kind
  *    of claim a TopK tie-break bug would silently break.
  */
object Round14Props extends Properties("graft.round14") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private val corpusGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, Gen.chooseNum(1L, 1000L))
  } yield rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }

  property("A-ES sample: exactly min(n, N) distinct keys, stable under repartition") =
    forAll(corpusGen, Gen.chooseNum(1, 50)) { (rows, n) =>
      import spark.implicits._
      val df = rows.toDF("k", "w")
      val s1 = Sampling.weightedSampleNoReplace(df, col("k"), col("w"), n)
        .select("k").as[Long].collect().toSet
      val s2 = Sampling.weightedSampleNoReplace(df.repartition(3), col("k"),
        col("w"), n).select("k").as[Long].collect().toSet
      s1.size == math.min(n, rows.size) && s1 == s2
    }

  property("A-ES sample: scaling all weights by a constant keeps the sample") =
    forAll(corpusGen, Gen.chooseNum(1, 20)) { (rows, n) =>
      import spark.implicits._
      // -ln(u)/(c*w) is a monotone transform of -ln(u)/w, so the top-n
      // SET is scale-invariant (ties broken by key both times)
      val df = rows.toDF("k", "w")
      val scaled = rows.map { case (k, w) => (k, w * 7) }.toDF("k", "w")
      val s1 = Sampling.weightedSampleNoReplace(df, col("k"), col("w"), n)
        .select("k").as[Long].collect().toSet
      val s2 = Sampling.weightedSampleNoReplace(scaled, col("k"), col("w"), n)
        .select("k").as[Long].collect().toSet
      s1 == s2
    }

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 25)
    docs <- Gen.listOfN(n, Gen.chooseNum(1, 30))
  } yield docs.zipWithIndex.map { case (len, i) =>
    (i.toLong, (0 until len).map(j => s"w${(i + j) % 7}").mkString(" "))
  }

  property("tokenBudgetFill: minimal cover of the budget when tokens suffice") =
    forAll(docsGen, Gen.chooseNum(1L, 200L)) { (docs, budget) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val sel = Corpus.tokenBudgetFill(df, budget)
        .as[(Long, Long, Long)].collect().sortBy(_._3)
      val total = sel.map(_._2).sum
      val corpusTotal = docs.map(_._2.split("\\s+").length.toLong).sum
      if (corpusTotal < budget) total == corpusTotal // everything taken
      else total >= budget && total - sel.last._2 < budget
    }

  private val matGen: Gen[(List[List[Float]], List[Float], List[Float])] = for {
    dIn <- Gen.chooseNum(1, 6)
    dOut <- Gen.chooseNum(1, 6)
    w <- Gen.listOfN(dOut, Gen.listOfN(dIn, Gen.chooseNum(-8, 8).map(_ / 4.0f)))
    m <- Gen.listOfN(dIn, Gen.chooseNum(-8, 8).map(_ / 4.0f))
    v <- Gen.listOfN(dIn, Gen.chooseNum(-8, 8).map(_ / 4.0f))
  } yield (w, m, v)

  property("MatVecCentered == driver-side double loop on random matrices") =
    forAll(matGen) { case (w, m, v) =>
      import spark.implicits._
      val out = Seq(Tuple1(v)).toDF("embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .select(graft.functions.MatVecCentered.matVecCentered(
          col("embedding"), w.map(_.toSeq), m).as("y"))
        .as[Seq[Float]].head()
      val expect = w.map { row =>
        row.zip(v.zip(m).map { case (x, mm) => x.toDouble - mm })
          .map { case (ww, c) => ww * c }.sum.toFloat
      }
      out == expect
    }

  private val vecsGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.chooseNum(4, 24)
    vs <- Gen.listOfN(n, Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 100.0f)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("semanticPairs candidates grow monotonically with probes") =
    forAll(vecsGen) { vecs =>
      import spark.implicits._
      val emb = vecs.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      val p1 = Dedup.semanticPairs(emb, 0.3, nCentroids = 3, probes = 1)
        .as[(Long, Long)].collect().toSet
      val p2 = Dedup.semanticPairs(emb, 0.3, nCentroids = 3, probes = 2)
        .as[(Long, Long)].collect().toSet
      p1.subsetOf(p2)
    }

  // random tiny corpora: 2-12 docs over a 6-token vocabulary so tf,
  // df, and dl all vary and collide
  private val bmDocsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 12)
    docs <- Gen.listOfN(n, Gen.nonEmptyListOf(
      Gen.oneOf("ape", "bee", "cat", "dog", "elk", "fox")))
  } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  property("BM25 term math equals the BigInt brute force on random corpora") =
    forAll(bmDocsGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val qterms = graft.operators.Retrieval.queryTermsLocal(df, 2, 3)
      val got = graft.operators.Retrieval
        .bm25TopK(df, 2, 3, k = docs.size, qterms = Some(qterms))
        .select("q_id", "doc_id", "score_bp")
        .as[(Long, Long, Long)].collect()
        .map { case (q, d, s) => (q, d) -> s }.toMap
      // brute force with BigInt arithmetic, straight from the formula
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val n = BigInt(docs.size)
      val sumdl = BigInt(toks.values.map(_.size).sum)
      val dfOf = (t: String) => BigInt(toks.values.count(_.contains(t)))
      val want = (for {
        (q, tok) <- qterms
        (d, ws) <- toks if ws.contains(tok)
      } yield {
        val tf = BigInt(ws.count(_ == tok)); val dl = BigInt(ws.size)
        val dfv = dfOf(tok)
        val num = BigInt(10000) * (2 * n - 2 * dfv + 1) * 22 * tf * sumdl
        val den = (2 * dfv + 1) * (10 * tf * sumdl + 3 * sumdl + 9 * dl * n)
        ((q, d), num / den)
      }).groupBy(_._1).view.mapValues(_.map(_._2).sum.toLong).toMap
      got == want
    }

  property("stratifiedWeightedSample: per-stratum cap holds on random strata") =
    forAll(corpusGen, Gen.chooseNum(1, 5)) { (rows, n) =>
      import spark.implicits._
      val df = rows.map { case (k, w) => (k, w, (k % 3).toString) }
        .toDF("k", "w", "g")
      val counts = Sampling.stratifiedWeightedSample(df, col("g"), col("k"),
        col("w"), n).groupBy("g").count().as[(String, Long)].collect().toMap
      val sizes = df.groupBy("g").count().as[(String, Long)].collect().toMap
      sizes.forall { case (g, total) =>
        counts.getOrElse(g, 0L) == math.min(n.toLong, total) }
    }

  // fast default profile (r22): full sweep depth via
  // -Dgraft.props.trials=full — see graft.TestProfile
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(100, 20))
}
