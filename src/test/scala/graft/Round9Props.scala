package graft

import graft.operators.{Corpus, Dedup, Linkage}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the round-9 operators. The load-
  * bearing one: prefix-filtered exact Jaccard is output-identical to
  * the plain inverted-index join on RANDOM corpora — the prefix bound
  * (a qualifying pair must collide inside each doc's rarest
  * n - ceil(t*n) + 1 shingles under the global df order) is easy to
  * get subtly wrong (off-by-one, tie order), and a fixture can't
  * explore the size/overlap space a generator can.
  */
object Round9Props extends Properties("graft.round9") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  // small vocabulary forces shingle collisions; 6-14 tokens per doc
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(4, 14)
    docs <- Gen.listOfN(nDocs,
      Gen.chooseNum(6, 14).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(0, 11).map(v => s"w$v"))
          .map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
    import spark.implicits._
    df.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
  }

  property("jaccardPairsPrefix == jaccardPairs on random corpora at random thresholds") =
    forAll(corpusGen, Gen.oneOf(0.3, 0.5, 0.7, 0.9)) { (docs, t) =>
      import spark.implicits._
      val sh = Dedup.shingles(docs.toDF("doc_id", "text"))
      pairs(Dedup.jaccardPairsPrefix(sh, t)) == pairs(Dedup.jaccardPairs(sh, t))
    }

  property("lengthBucketProfile: identity + total doc conservation") =
    forAll(Gen.listOfN(30, Gen.chooseNum(1, 700))) { lens =>
      import spark.implicits._
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val rows = Corpus.lengthBucketProfile(docs)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      rows.forall { case (_, cap, n, sum, pad, trunc, _) =>
        sum + pad - trunc == n * cap
      } && rows.map(_._3).sum == lens.size
    }

  property("driftProfile: shares sum to <= 10000bp per snapshot, drift is |a-b|") =
    forAll(Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0, 3)))) { xs0 =>
      import spark.implicits._
      val xs = xs0.distinctBy(_._1)
      val docs = xs.map { case (id, s) => (id, s"src$s") }.toDF("doc_id", "source")
      // guard: both snapshots non-empty, else the bp division is x/0
      val hasA = xs.exists(_._1 % 2 == 0)
      val hasB = xs.exists(_._1 % 2 == 1)
      !(hasA && hasB) || {
        val rows = Corpus.driftProfile(docs, col("doc_id") % 2 === 0)
          .as[(String, Long, Long, Long, Long, Long)].collect()
        rows.map(_._4).sum <= 10000 && rows.map(_._5).sum <= 10000 &&
          rows.forall { case (_, _, _, a, b, d) => d == math.abs(a - b) }
      }
    }

  // short strings over a 3-letter alphabet force dense ED<=d
  // neighborhoods; includes empty strings and exact duplicates.
  private val stringsGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(3, 12)
    ss <- Gen.listOfN(n, Gen.chooseNum(0, 5).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString)))
  } yield ss

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("editDistancePairs == brute-force levenshtein at d=1 and d=2") =
    forAll(stringsGen, Gen.oneOf(1, 2)) { (ss, d) =>
      import spark.implicits._
      val rows = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Linkage.editDistancePairs(
        rows.toDF("id", "s"), col("id"), col("s"), d)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist)).toSet
      got == want
    }

  property("tfCosinePairs == brute-force integer cosine test") =
    forAll(corpusGen, Gen.oneOf((1, 2), (3, 5), (9, 10))) { (docs, pq) =>
      import spark.implicits._
      val (p, q) = pq
      val got = Linkage.tfCosinePairs(docs.toDF("doc_id", "text"), p, q)
        .select("doc_a", "doc_b", "dot").as[(Long, Long, Long)].collect().toSet
      def tf(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
      val want = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        fa = tf(ta); fb = tf(tb)
        dot = fa.keysIterator.map(w => fa(w) * fb.getOrElse(w, 0L)).sum
        n2a = fa.valuesIterator.map(v => v * v).sum
        n2b = fb.valuesIterator.map(v => v * v).sum
        if q.toLong * q * dot * dot >= p.toLong * p * n2a * n2b && dot > 0
      } yield (a, b, dot)).toSet
      got == want
    }

  property("diversityProfile == brute-force Simpson/top-share bp") =
    forAll(corpusGen, Gen.chooseNum(1, 4)) { (docs, nSrc) =>
      import spark.implicits._
      val rows = docs.map { case (id, t) => (id, t, s"s${id % nSrc}") }
      val got = Corpus.diversityProfile(rows.toDF("doc_id", "text", "source"))
        .as[(String, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._3).map { case (src, ds) =>
        val tf = ds.flatMap(_._2.split("\\s+")).groupBy(identity)
          .map { case (_, o) => o.length.toLong }
        val n = tf.sum
        val s2 = tf.map(v => BigInt(v) * v).sum
        (src, n, (s2 * 10000 / (BigInt(n) * n)).toLong,
          tf.max * 10000 / n)
      }.toSet
      got == want
    }

  property("gramMatrix == brute-force quantized upper-triangle sums") =
    forAll(Gen.chooseNum(1, 6).flatMap(d =>
      Gen.listOfN(8, Gen.listOfN(d, Gen.chooseNum(-1000, 1000).map(_ / 997.0f)))
        .map(vs => (d, vs)))) { case (d, vs) =>
      import spark.implicits._
      val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = graft.operators.Similarity.gramMatrix(emb, dim = d)
        .as[(Int, Int, Long)].collect().toSet
      val qs = vs.map(_.map(x => math.floor(x.toDouble * 1024).toLong))
      val want = (for { i <- 0 until d; j <- i until d } yield
        (i, j, qs.map(q => q(i) * q(j)).sum)).toSet
      got == want
    }

  property("winnowing (native) == composable == brute-force local minima") = {
    val textGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', ' ')).map(_.mkString))
    forAll(Gen.listOfN(5, textGen), Gen.chooseNum(2, 5), Gen.chooseNum(2, 4)) {
      (texts, k, w) =>
        import spark.implicits._
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val df = docs.toDF("doc_id", "text")
        val got = graft.operators.TextAnalysis.winnowing(df, k, w)
          .as[(Long, Int, Long)].collect().toSet
        val comp = graft.operators.TextAnalysis.winnowingComposable(df, k, w)
          .as[(Long, Int, Long)].collect().toSet
        val want = docs.flatMap { case (id, t) =>
          val cps = t.map(_.toLong)
          val gh = (0 to cps.length - k).map(p =>
            cps.slice(p, p + k).foldLeft(0L)((a, c) =>
              (a * 257L + c) % 1000000000000000L))
          ((w - 1) until gh.length).collect {
            case p if gh(p) == gh.slice(p - w + 1, p + 1).min =>
              (id, p, gh(p))
          }
        }.toSet
        got == want && comp == want
    }
  }

  property("ngramLm == brute-force trigram top-k with (n desc, w3) tiebreak") =
    forAll(corpusGen, Gen.oneOf(1, 3)) { (docs, k) =>
      import spark.implicits._
      val got = Corpus.ngramLm(docs.toDF("doc_id", "text"), k)
        .as[(String, String, String, Long, Long, Long, Int)].collect().toSet
      val tris = docs.flatMap { case (_, t) =>
        t.split("\\s+").toList.sliding(3).filter(_.size == 3)
          .map(w => (w(0), w(1), w(2))) }
      val cnt = tris.groupBy(identity).map { case (t3, o) => (t3, o.length.toLong) }
      val want = cnt.groupBy(e => (e._1._1, e._1._2)).flatMap { case ((w1, w2), m) =>
        val ctxN = m.values.sum
        m.toList.map { case ((_, _, w3), n) => (w3, n) }
          .sortBy { case (w3, n) => (-n, w3) }.zipWithIndex.take(k)
          .map { case ((w3, n), i) =>
            (w1, w2, w3, n, ctxN, n * 10000 / ctxN, i + 1) }
      }.toSet
      got == want
    }

  // fast default profile (r22): full sweep depth via
  // -Dgraft.props.trials=full — see graft.TestProfile
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(100, 20))
}
