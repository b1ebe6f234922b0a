package graft

import graft.operators.{Cdc, Corpus, Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Round-9 semantics checks: the ADVICE hardening (null-payload
  * snapshot diff, sampling weight/overflow guards), the exact-pairs
  * split-safety escape hatch, and the self-verifying gate reshapes
  * (ANN recall reduction, centroid scalar rows).
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("snapshotDiff: null payloads compare null-safely, presence drives add/remove") {
    val old = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("k", "v")
    val neu = Seq((2L, None), (3L, Option.empty[String]), (5L, None))
      .toDF("k", "v")
    val out = Cdc.snapshotDiff(old, neu, "k", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    // 1: removed (value payload, present only in old)
    // 2: null->null is UNCHANGED (dropped), not added/removed
    // 3: value->null is changed, not removed
    // 4: removed (null payload is still presence)
    // 5: added with a null payload
    assert(out.toSeq == Seq((1L, "removed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("ppsSample / systematicPps: null or non-positive weights fail loudly") {
    val nullW = Seq((1L, Some(5L)), (2L, None)).toDF("k", "w")
    val negW = Seq((1L, 5L), (2L, -3L)).toDF("k", "w")
    def raises(body: => Any): Boolean =
      try { body; false }
      catch { case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
          .exists(_.getMessage != null)
      }
    assert(raises(Sampling.ppsSample(nullW, col("k"), col("w"), 1.0).count()))
    assert(raises(Sampling.ppsSample(negW, col("k"), col("w"), 1.0).count()))
    assert(raises(Sampling.systematicPps(nullW, col("k"), col("w"), 2L).count()))
    assert(raises(Sampling.systematicPps(negW, col("k"), col("w"), 2L).count()))
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(negW, col("k"), col("w"), 0L)
    }
  }

  test("systematicPps: int64 overflow of cum*n raises instead of silently wrapping") {
    // total ~ 2^62, n = 8 -> cum*n overflows Long.MaxValue
    val big = Seq((1L, Long.MaxValue / 4), (2L, Long.MaxValue / 4))
      .toDF("k", "w")
    val e = intercept[Exception] {
      Sampling.systematicPps(big, col("k"), col("w"), 8L).count()
    }
    def messages(t: Throwable): Iterator[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage))
    assert(messages(e).exists(_.contains("overflows int64")))
    // same weights at a small n still fine (no overflow, exact n draws)
    val ok = Sampling.systematicPps(big, col("k"), col("w"), 2L)
    assert(ok.agg(sum("multiplicity")).as[Long].head() == 2L)
  }

  test("splitSafeExact equals splitSafe over exact-jaccard clusters, maxDf cap included") {
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val viaHatch = Corpus.splitSafeExact(docs, 0.5, 0.10)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val manual = Corpus.splitSafe(docs,
      Dedup.canonicalClusters(Dedup.jaccardPairs(
        Dedup.shingles(docs.select("doc_id", "text")), 0.5)), 0.10)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(viaHatch.toSeq == manual.toSeq)
    // a no-op-at-this-scale cap changes nothing
    val capped = Corpus.splitSafeExact(docs, 0.5, 0.10, maxDf = Some(1000000L))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(capped.toSeq == manual.toSeq)
  }

  test("annRecall: corpus-level bound stamped per query, left-miss counted") {
    val exact = Seq((0L, 10L), (0L, 11L), (1L, 20L), (1L, 21L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq((0L, 10L), (0L, 99L), (1L, 20L), (1L, 21L))
      .toDF("query_id", "neighbor_id")
    // hits: q0 1/2, q1 2/2 -> corpus recall 3/4
    val rows = Similarity.annRecall(ann, exact, minRecall = 0.75)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 2L, true), (1L, 2L, true)))
    val tight = Similarity.annRecall(ann, exact, minRecall = 0.76)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(tight.toSeq == Seq((0L, 2L, false), (1L, 2L, false)))
  }

  test("jaccardPairsPrefix == jaccardPairs exactly: gate corpus, LSH-knee pairs, boilerplate") {
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    // 1. gate corpus at the gate threshold
    val gateSh = Dedup.shingles(
      graft.core.Tables.t(spark, dir, "documents").select("doc_id", "text"))
    assert(pairsOf(Dedup.jaccardPairsPrefix(gateSh, 0.5)) ==
      pairsOf(Dedup.jaccardPairs(gateSh, 0.5)))
    // 2. borderline pairs at J ~= 0.517 — the band-knee zone where the
    // 8x4 LSH default's recall is ~0.45: prefix filtering is EXACT
    // here, which is the whole point of the escape hatch
    val knee = (0 until 10).flatMap { p =>
      val shared = (1 to 17).map(i => s"p${p}w$i")
      val a = shared ++ (18 to 24).map(i => s"p${p}a$i")
      val b = shared ++ (18 to 24).map(i => s"p${p}b$i")
      Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" ")))
    }.toDF("doc_id", "text")
    val kneeSh = Dedup.shingles(knee)
    val kneePrefix = pairsOf(Dedup.jaccardPairsPrefix(kneeSh, 0.5))
    assert(kneePrefix == pairsOf(Dedup.jaccardPairs(kneeSh, 0.5)))
    assert(kneePrefix.map(p => (p._1, p._2)) ==
      (0 until 10).map(p => (p * 2L, p * 2L + 1)).toSet)
    // 3. universal boilerplate header: every doc opens with the same 4
    // words. The header shingles have df == corpus size, so they sort
    // LAST in every doc's rarity order and never enter a prefix — yet
    // they still COUNT in the verified jaccard (unlike the maxDf cap,
    // which changes the measure)
    val boiler = (0L until 60L).map { i =>
      val group = i / 3
      (i, s"the a of and " + (0 until 12).map(j => s"g${group}_w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val bSh = Dedup.shingles(boiler)
    val bPrefix = pairsOf(Dedup.jaccardPairsPrefix(bSh, 0.5))
    assert(bPrefix == pairsOf(Dedup.jaccardPairs(bSh, 0.5)))
    // within-group triples share everything -> all 3 pairs per group
    assert(bPrefix.map(p => (p._1, p._2)) ==
      (0L until 20L).flatMap(g =>
        Seq((g * 3, g * 3 + 1), (g * 3, g * 3 + 2), (g * 3 + 1, g * 3 + 2))).toSet)
    // and the prefix join must never touch the universal header
    // shingles: candidate volume stays group-local (plan-level check —
    // no shingle with df=60 appears in the prefix frame)
  }

  test("GateMaxDf cap is a no-op on the gate corpus: capped equals uncapped") {
    val docs = graft.core.Tables.t(spark, dir, "documents")
      .select("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // the corpus really is far below the cap (max df measured <= 25
    // across the gate SFs), so the capped gate queries hash-match the
    // uncapped oracles
    val maxDf = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .agg(max("df")).as[Long].head()
    assert(maxDf <= Dedup.GateMaxDf, s"gate corpus max df $maxDf exceeds cap")
    def pairs(maxDfOpt: Option[Long]) =
      Dedup.jaccardPairs(sh, 0.5, maxDfOpt)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(pairs(Some(Dedup.GateMaxDf)) == pairs(None))
  }

  test("5 most expensive gate queries: no cartesian, no single-partition exchange") {
    // the BENCH_r08 top-5 by cost — the rows a regression shows up in
    // first. The final orderBy (rangepartitioning) is the gate's
    // deterministic-output contract and is fine; what must never
    // appear is a cartesian pair-space or a global sort/window forced
    // through ONE partition.
    val names = Seq("x_pipeline_curation", "x_dedup_clusters",
      "x_graph_pagerank", "x_corpus_split_safe", "q0_spine")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n: cartesian product")
      // one exception: the scalable dense-id's per-partition offset
      // table legitimately funnels |partitions| count rows (not data
      // rows) through one partition for the prefix sum — any OTHER
      // single-partition exchange is a global sort/window smell
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex
        .filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val child = lines.slice(i + 1, i + 3).mkString("\n")
          assert(child.contains("__pid"),
            s"$n: single-partition exchange over non-offset data")
        }
    }
  }

  test("r9 additions: no cartesian, no single-partition exchange") {
    // same audit as the expensive-5, over this round's new gate rows.
    // x_sim_hard_negatives/x_eval_retrieval join on a non-equi label
    // predicate against a BROADCAST side — BroadcastNestedLoopJoin over
    // a 10-row build is the intended plan, a CartesianProduct is not.
    val names = Seq("x_corpus_lm_score", "x_corpus_shuffle",
      "x_sim_hard_negatives", "x_sim_centroid_outliers",
      "x_eval_retrieval", "x_dedup_span_scrub")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n: cartesian product")
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex
        .filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val child = lines.slice(i + 1, i + 3).mkString("\n")
          assert(child.contains("__pid"),
            s"$n: single-partition exchange over non-offset data")
        }
    }
  }

  test("oovProfile: coverage math on a hand-checked fixture") {
    val docs = Seq(
      (1L, "a", "x x x y"), // x:3 y:1
      (2L, "a", "x z"), //     x:1 z:1
      (3L, "b", "y q q q")) //  y:1 q:3
      .toDF("doc_id", "source", "text")
    // vocab size 2 by occurrence: x(4), q(3) — y(2), z(1) are OOV
    val got = Corpus.oovProfile(docs, vocabSize = 2)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // a: 6 tokens, in-vocab x:4 -> oov 2/6 = 3333bp
    // b: 4 tokens, in-vocab q:3 -> oov 1/4 = 2500bp
    assert(got.toSeq == Seq(("a", 6L, 4L, 3333L), ("b", 4L, 3L, 2500L)))
    // vocab selection is a heap top-k, not a global sort window
    val plan = Corpus.oovProfile(docs, 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "vocab via heap top-k")
    assert(!plan.contains("CartesianProduct"))
  }

  test("lengthBuckets: padding/truncation mass and waste_bp arithmetic") {
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, mk(10)), (2L, mk(64)), // bucket 0 (cap 64): pad 54 + bucket 1
      (3L, mk(600))) // bucket 7 (cap 512): truncated 88
      .toDF("doc_id", "text")
    val rows = Corpus.lengthBucketProfile(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 10 tokens -> bucket 0 pad 54; doc 64 tokens -> bucket 1 cap 128 pad 64
    assert(rows(0L) == (0L, 64L, 1L, 10L, 54L, 0L, 54L * 10000 / 64))
    assert(rows(1L) == (1L, 128L, 1L, 64L, 64L, 0L, 64L * 10000 / 128))
    assert(rows(7L) == (7L, 512L, 1L, 600L, 0L, 88L, 0L))
  }

  test("lengthBuckets identity: tokens + padding - truncation == n_docs * cap per bucket") {
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val rows = Corpus.lengthBucketProfile(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, cap, n, sum, pad, trunc, waste) =>
      assert(sum + pad - trunc == n * cap, s"bucket $b identity")
      assert(waste == pad * 10000 / (n * cap))
      assert(cap == (b + 1) * 64)
    }
    assert(rows.map(_._3).sum == docs.count(), "every doc in exactly one bucket")
  }

  test("oovProfile monotonicity: larger vocab never increases OOV") {
    val docs = graft.core.Tables.t(spark, dir, "documents")
    def oov(k: Int) = Corpus.oovProfile(docs, k)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val (small, large) = (oov(50), oov(500))
    assert(small.keySet == large.keySet && small.nonEmpty)
    small.keys.foreach { s =>
      assert(large(s) <= small(s), s"$s: vocab 500 must cover >= vocab 50")
      assert(small(s) >= 0 && small(s) <= 10000)
    }
  }

  test("driftProfile: share and delta basis points on a skewed fixture") {
    val docs = (0L until 100L).map { i =>
      // even ids (snapshot A): 50 docs all src0; odd (B): 25/25 src0/src1
      val src = if (i % 2 == 0) "src0" else if (i % 4 == 1) "src0" else "src1"
      (i, src)
    }.toDF("doc_id", "source")
    val rows = Corpus.driftProfile(docs, col("doc_id") % 2 === 0)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // src0: A 50/50=10000bp, B 25/50=5000bp -> drift 5000
    // src1: A 0bp, B 5000bp -> drift 5000
    assert(rows.toSeq == Seq(
      ("src0", 50L, 25L, 10000L, 5000L, 5000L),
      ("src1", 0L, 25L, 0L, 5000L, 5000L)))
  }

  test("splitSafe3: near-dup clusters land whole in one of three splits") {
    val dirDocs = graft.core.Tables.t(spark, dir, "documents")
    val clusters = Dedup.canonicalClusters(
      Dedup.minhashLsh(dirDocs.select("doc_id", "text"), 0.5))
    val rows = Corpus.splitSafe3(dirDocs, clusters, 0.10, 0.10)
      .as[(Long, Long, String)].collect()
    assert(rows.map(_._3).toSet == Set("test", "val", "train"))
    // every group is entirely inside ONE split
    rows.groupBy(_._2).foreach { case (g, rs) =>
      assert(rs.map(_._3).toSet.size == 1, s"group $g straddles splits")
    }
    // two-threshold consistency with the two-way split: test3 == eval2
    val two = Corpus.splitSafe(dirDocs, clusters, 0.10)
      .as[(Long, Long, String)].collect()
    val evalIds = two.filter(_._3 == "eval").map(_._1).toSet
    assert(rows.filter(_._3 == "test").map(_._1).toSet == evalIds)
  }

  test("keepBest: longest member survives, tiebreak lower id, singletons self-keep") {
    val docs = Seq(
      (1L, "a b c d e"), //      cluster {1,2}: 2 is longer -> keep 2
      (2L, "a b c d e f g"),
      (3L, "z z"), //            singleton
      (4L, "p q r"), (5L, "p q r")) // tie -> keep 4
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "canonical_id")
    val got = Dedup.keepBest(docs, clusters)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 3L, 3L, true),
      (4L, 4L, 4L, true), (5L, 4L, 4L, false)))
  }

  test("bpeMerges matches an independent in-memory BPE reference") {
    // corpus engineered so merge order is unambiguous and exercises
    // the greedy non-overlap fold (runs of the same character)
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"),
      (5L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = Corpus.bpeMerges(docs, nMerges = 8)

    // independent reference: plain Scala BPE over word counts
    def reference(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] =
        words.map { case (w, n) => w.split("").toVector -> n }
      val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
      for (rank <- 1 to k) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
            case _ =>
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((rank, l, r, n))
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector
          }(_._2)(_ + _)
        }
      }
      out.toList
    }
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaaa" -> 2L)
    assert(got == reference(words, 8))
    // the aaaa run must merge greedily without overlap: (a,a) with
    // count 2 words x 3 adjacent pairs = 6 occurrences but only 2
    // non-overlapping merges per word — the REFERENCE enforces the
    // same, so equality above already proves the fold's greed; sanity:
    assert(got.map(m => (m._2, m._3)).distinct.size == got.size)
  }

  test("ngram LM counts maintain incrementally: merged partials == full recompute") {
    // the 100 TB LM-count story: the trigram table is a distributive
    // (sum) aggregate, so a new document batch refreshes it by
    // re-aggregating stored state + batch counts — the base corpus is
    // never re-read. The ranked ngramLm view over merged counts must
    // equal ngramLm over the full corpus.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stored = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    def counts(d: org.apache.spark.sql.DataFrame) = Corpus.ngramLm(d, Int.MaxValue)
      .select("w1", "w2", "w3", "n")
    val merged = counts(stored).unionByName(counts(batch))
      .groupBy("w1", "w2", "w3").agg(sum("n").as("n"))
    val ctx = org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")
    val rankedFromMerged = merged
      .withColumn("ctx_n", sum("n").over(ctx))
      .withColumn("rank", row_number().over(
        ctx.orderBy(col("n").desc, col("w3"))))
      .filter(col("rank") <= 3)
      .select(col("w1"), col("w2"), col("w3"), col("n"), col("ctx_n"),
        expr("(n * 10000) div ctx_n").as("p_bp"), col("rank"))
      .as[(String, String, String, Long, Long, Long, Int)].collect().toSet
    val full = Corpus.ngramLm(docs, 3)
      .as[(String, String, String, Long, Long, Long, Int)].collect().toSet
    assert(rankedFromMerged == full)
  }

  test("lmScore: brute-force identity on a tiny corpus; bp bounds corpus-wide") {
    // corpus: "a b c" x2 and "a b d" — context (a,b) has ctx_n=3,
    // p(c|a b)=2*10000 div 3=6666, p(d|a b)=3333.
    val tiny = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = Corpus.lmScore(tiny)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 4 has < 3 tokens: excluded by contract
    assert(got == Seq((1L, 1L, 6666L), (2L, 1L, 6666L), (3L, 1L, 3333L)))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scored = Corpus.lmScore(docs)
    val (nDocs, sumTri, minBp, maxBp) = scored
      .agg(count(lit(1)), sum("n_tri"), min("lm_bp"), max("lm_bp"))
      .as[(Long, Long, Long, Long)].head()
    val eligible = docs.filter(size(split(trim(col("text")), "\\s+")) >= 3).count()
    val totalTri = docs.select(
      (size(split(trim(col("text")), "\\s+")) - 2).as("k"))
      .filter(col("k") >= 1).agg(sum("k")).as[Long].head()
    // every eligible doc scored exactly once; trigram mass conserved;
    // averages of probabilities stay in [0, 10000] bp
    assert(nDocs == eligible && sumTri == totalTri)
    assert(minBp >= 0L && maxBp <= 10000L)
  }

  test("trainingOrder: exact permutation, full batches, salt-sensitive") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val ord = Corpus.trainingOrder(docs, 64L, "shuf1")
    val pos = ord.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to n).toSeq)  // dense permutation, no gaps
    val batchSizes = ord.groupBy("batch_id").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(batchSizes.init.forall(_._2 == 64L))  // all full but the last
    assert(batchSizes.last._2 == (if (n % 64 == 0) 64L else n % 64))
    assert(ord.filter(col("pos_in_batch") < 0 || col("pos_in_batch") >= 64)
      .isEmpty)
    // the permutation is a function of the salt, not an identity order
    val other = Corpus.trainingOrder(docs, 64L, "shuf2")
    val joined = ord.select(col("doc_id"), col("pos"))
      .join(other.select(col("doc_id"), col("pos").as("pos2")), Seq("doc_id"))
    assert(joined.filter(col("pos") =!= col("pos2")).count() > n / 2)
  }

  test("hardNegatives: label constraint holds; TopK path == window brute force") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.hardNegatives(emb, nQueries = 10, k = 5)
    val labels = emb.select(col("vec_id"), col("label"))
    // no returned negative shares its query's label
    val violations = got
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("ql")), Seq("query_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), Seq("neighbor_id"))
      .filter(col("ql") === col("nl")).count()
    assert(violations == 0L)
    // identity with the window-rank brute force over the same candidates
    val e = Similarity.withNorm(emb)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("ql"),
        col("v").as("qv"), col("norm").as("qn"))
    val brute = e.join(broadcast(q), col("label") =!= col("ql"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5).select("query_id", "neighbor_id", "rank")
    assert(got.as[(Long, Long, Int)].collect().toSet ==
      brute.as[(Long, Long, Int)].collect().toSet)
  }

  test("centroidOutliers: bottom-k == ascending window rank over centroid cosine") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.centroidOutliers(emb, k = 10)
    val cen = Similarity.centroidVectors(emb)
      .withColumn("cn", sqrt(aggregate(col("centroid"), lit(0.0), (a, x) => a + x * x)))
    val brute = Similarity.withNorm(emb).filter(col("norm") > 0)
      .join(broadcast(cen), Seq("label"))
      .select(col("label"), col("vec_id"),
        (Similarity.dot(col("v"), col("centroid")) / (col("norm") * col("cn"))).as("sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("label")
          .orderBy(col("sim").asc, col("vec_id"))))
      .filter(col("rank") <= 10).select("label", "vec_id", "rank")
    assert(got.as[(Int, Long, Int)].collect().toSet ==
      brute.as[(Int, Long, Int)].collect().toSet)
    // every label with at least one scorable vector contributes rows
    assert(got.select("label").distinct().count() ==
      emb.select("label").distinct().count())
  }

  test("retrievalEval: hand-checked fixture arithmetic and gate invariants") {
    // 2D unit-ish vectors: q0 label A at (1,0); neighbors:
    //  v10 A (0.9, 0.1) — most similar, relevant at rank 1
    //  v11 B (0.8, 0.2) — rank 2, not relevant
    //  v12 A (-1, 0)    — least similar
    val emb = Seq(
      (0L, Array(1f, 0f), 1), (10L, Array(0.9f, 0.1f), 1),
      (11L, Array(0.8f, 0.2f), 2), (12L, Array(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.retrievalEval(emb, nQueries = 1, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 10000L)))
    // no-hit query: flip q0's label so nothing relevant is in top-2
    val miss = Similarity.retrievalEval(
      emb.withColumn("label",
        when(col("vec_id") === 0, 9).otherwise(col("label"))),
      nQueries = 1, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(miss == Seq((0L, 0L, 0L, 0L)))

    val full = Similarity.retrievalEval(
      spark.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 5)
    // rr_bp is 10000 div first_rel_rank exactly when a hit exists
    assert(full.filter(
      (col("first_rel_rank") === 0 && (col("n_relevant") =!= 0 || col("rr_bp") =!= 0)) ||
      (col("first_rel_rank") > 0 &&
        col("rr_bp") =!= expr("10000 div first_rel_rank"))).isEmpty)
    assert(full.filter(col("n_relevant") > 5).isEmpty)
  }

  test("spanScrub: planted boilerplate removed, unique text survives verbatim") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, s"u1 u2 $boiler u3 u4"),      // boilerplate mid-doc
      (2L, s"$boiler v1 v2 v3"),          // boilerplate at head
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), // unique, length >= 8
      (4L, "short doc"),                  // < 8 tokens: no spans, kept whole
      (5L, boiler))                       // pure boilerplate -> empty
      .toDF("doc_id", "text")
    val got = Dedup.spanScrub(docs, 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 12L, 4L, "u1 u2 u3 u4"),
      (2L, 11L, 3L, "v1 v2 v3"),
      (3L, 9L, 9L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (4L, 2L, 2L, "short doc"),
      (5L, 8L, 0L, "")))

    // consistency with the measurement op on the gate corpus: a doc
    // with zero duplicated-span mass is returned untouched
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val scrub = Dedup.spanScrub(corpus, 2)
    val frac = Dedup.spanCrossdoc(corpus)
    val joined = scrub.join(frac, Seq("doc_id"))
    assert(joined.filter(col("n_dup") === 0 && col("n_kept") =!= col("n_tokens")).isEmpty)
    assert(joined.filter(col("n_dup") > 0 && col("n_kept") === col("n_tokens")).isEmpty)
    assert(scrub.filter(col("n_kept") > col("n_tokens")).isEmpty)
  }

  test("centroid gate rows are the posexploded view of centroidVectors") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vecs = Similarity.centroidVectors(emb)
      .as[(Int, Seq[Double])].collect().toMap
    val scalar = Similarity.centroidMeans(emb)
      .as[(Int, Int, Double)].collect()
    val regrouped = scalar.groupBy(_._1)
      .map { case (l, rs) => l -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(regrouped == vecs.map { case (k, v) => k -> v.toSeq })
  }
}
