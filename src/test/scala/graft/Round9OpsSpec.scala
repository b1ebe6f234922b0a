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
