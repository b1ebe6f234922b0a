package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval}

/** BM25 sparse retrieval: exact-integer scoring properties, the
  * known-item contract of the gate's query construction, inline ==
  * from-index equality, and the planning-time pb prune on the stored
  * postings layout. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Score one synthetic (tf, dl, df) point through the public rank
    * path: a single query term hitting a single one-doc posting, with
    * corpus stats (n, sumdl) supplied directly. */
  private def bpOf(tf: Long, dl: Long, df: Long, n: Long, sumdl: Long): Long = {
    val hits = Seq((7L, "t", tf, dl)).toDF("doc_id", "tok", "tf", "dl")
    val dfT = Seq(("t", df)).toDF("tok", "df")
    val stats = Seq((n, sumdl)).toDF("n", "sumdl")
    Retrieval.bm25Rank(hits, dfT, Seq((0L, "t")), stats, k = 1)
      .select("score_bp").head().getLong(0)
  }

  test("term score is monotone in tf, anti-monotone in df and dl") {
    val base = bpOf(tf = 2, dl = 100, df = 10, n = 1000, sumdl = 100000)
    assert(bpOf(3, 100, 10, 1000, 100000) > base, "more occurrences must score higher")
    assert(bpOf(2, 100, 50, 1000, 100000) < base, "commoner terms must score lower")
    assert(bpOf(2, 400, 10, 1000, 100000) < base, "longer docs must score lower")
    // tf saturation: the k1 cap bounds the tf term at (k1+1)/1 = 2.2x
    // the tf=inf asymptote; doubling tf from an already-high value
    // moves the score by less than the first doubling did.
    val lo = bpOf(1, 100, 10, 1000, 100000)
    val mid = bpOf(2, 100, 10, 1000, 100000)
    val hi = bpOf(4, 100, 10, 1000, 100000)
    assert(mid - lo > hi - mid, "tf gain must saturate (k1 damping)")
  }

  test("maxDf drops stopword-hot query terms from scoring") {
    val hits = Seq((1L, "the", 5L, 10L), (1L, "rare", 1L, 10L))
      .toDF("doc_id", "tok", "tf", "dl")
    val dfT = Seq(("the", 900L), ("rare", 2L)).toDF("tok", "df")
    val stats = Seq((1000L, 10000L)).toDF("n", "sumdl")
    val qterms = Seq((0L, "the"), (0L, "rare"))
    val capped = Retrieval.bm25Rank(hits, dfT, qterms, stats, 5, maxDf = Some(100L))
      .select("score_bp").head().getLong(0)
    val rareOnly = Retrieval.bm25Rank(hits, dfT, Seq((0L, "rare")), stats, 5)
      .select("score_bp").head().getLong(0)
    assert(capped == rareOnly,
      "a term over the df cap must contribute exactly nothing")
  }

  test("known-item contract: each query's own doc is scored on every query term") {
    val qterms = Retrieval.queryTermsLocal(docs)
    val hits = Retrieval.bm25Hits(docs, qterms.map(_._2))
    val perQ = qterms.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val own = hits.filter(col("doc_id") < Retrieval.NQueries)
      .select("doc_id", "tok").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    perQ.foreach { case (q, toks) =>
      assert(own.get(q).exists(toks.subsetOf(_)),
        s"query $q's own doc must carry postings for all its terms $toks")
    }
  }

  test("from-index search equals the inline query (df from dictionary, not recomputed)") {
    val path = tmp("bm25idx")
    IndexStore.buildPostingsIndex(docs, path, pbMod = 8)
    val inline = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    val indexed = IndexStore.bm25FromIndex(docs, spark, path,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(inline.sameElements(indexed),
      "postings-artifact search must be output-identical to the inline path")
  }

  test("pbModForPostings scales with the corpus, not the query") {
    assert(IndexStore.pbModForPostings(8000000L) == 64,
      "soak-sized index stays at the measured gate balance")
    assert(IndexStore.pbModForPostings(1000000000L) == 1024)
    assert(IndexStore.pbModForPostings(1L) == 64, "floor holds")
    assert(IndexStore.pbModForPostings(Long.MaxValue / 2) == 4096, "cap holds")
  }

  test("RM3 expansion reaches docs sharing NO original query term") {
    // doc 0 is the query ("a b"); doc 1 matches and carries the hot
    // expansion token c; doc 2 has ONLY c — invisible to plain BM25,
    // reachable through feedback.
    val corpus = Seq((0L, "a b"), (1L, "a b c c c"), (2L, "c c c"))
      .toDF("doc_id", "text")
    val plain = Retrieval.bm25TopK(corpus, nQueries = 1, qLen = 2, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rm3 = Retrieval.bm25Rm3(corpus, nQueries = 1, qLen = 2, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!plain.contains(2L), "plain BM25 cannot see the c-only doc")
    assert(rm3.contains(2L), "feedback must surface the c-only doc")
    assert(rm3 == Set(0L, 1L, 2L))
  }

  test("RRF fusion: both-list docs outscore single-list docs at equal ranks") {
    // rank transform only: pts(r) = 10^7 div (60 + r); a doc at rank 3
    // in BOTH lists must beat a doc at rank 1 in one list only
    // (163934*2 = 327868 > 163934+0... vs rank-1 164k: 2x rank-3 pts
    // 158730*2 = 317460 > 163934) — the property that makes RRF favor
    // consensus over a single leg's confidence.
    val both = 2 * (Retrieval.RrfScale / (Retrieval.RrfC + 3))
    val single = Retrieval.RrfScale / (Retrieval.RrfC + 1)
    assert(both > single, "consensus at rank 3 must beat a lone rank 1")
  }

  test("hybrid gate: fused candidates come only from the two legs' top-k pools") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val fused = Retrieval.hybridRrf(docs, emb)
    val qterms = Retrieval.queryTermsLocal(docs)
    val lex = Retrieval.bm25TopK(docs)
      .select("q_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dense = Retrieval.denseTopK(emb, qterms.map(_._1).distinct, Retrieval.K)
      .select("q_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = fused.select("q_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty && out.subsetOf(lex ++ dense),
      "fusion must re-rank the union of the leg pools, never invent candidates")
    // per-query pool bound: <= 2k candidates ranked, k emitted
    val perQ = fused.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQ.forall(_ <= Retrieval.K), "output is top-kOut per query")
  }

  test("postings probe prunes to the query terms' pb partitions at planning time") {
    val path = tmp("bm25prune")
    IndexStore.buildPostingsIndex(docs, path, pbMod = 8)
    val probe = IndexStore.bm25FromIndex(docs, spark, path,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    val plan = probe.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains(path)).mkString("\n")
    assert(scans.contains("PartitionFilters: [pb"),
      s"postings scan must carry a static pb partition filter:\n$scans")
    // every join in the probe is against a quantizer-sized side
    // (query terms, df table, one-row stats) — a sort-merge join
    // anywhere means a broadcast was lost and the posting lists are
    // being shuffled
    assert(!plan.contains("SortMergeJoin"),
      "BM25 probe joins must all broadcast")
  }
}
