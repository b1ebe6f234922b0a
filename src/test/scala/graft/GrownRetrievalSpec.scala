package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval, Similarity}
import graft.streaming.{AnnIngest, DedupIngest, PostingsIngest}

/** The full production retrieval shape with BOTH legs grown: a BM25
  * postings store and an IVFADC vector store, each grown from batch
  * ingests and consolidated, compose through reciprocal-rank fusion
  * under the same (q_id, doc_id, rank) contract as the inline legs —
  * and the growth is INVISIBLE to the fusion (the lexical leg is
  * bit-equal to one-shot by the postings store's contract, so fusing
  * it with the grown dense leg equals fusing the one-shot lex with
  * that same dense leg, row for row). */
class GrownRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select("vec_id", "embedding")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("hybrid RRF over the two grown stores equals fusion of the " +
      "one-shot legs; the dense leg holds the family recall bar") {
    // grow the lexical store
    val proot = tmp("hyb-postings")
    for (b <- 0L until 3L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, s"$proot/store")
    PostingsIngest.consolidate(spark, s"$proot/store", s"$proot/index")
    // grow the dense store
    val aroot = tmp("hyb-ann")
    for (b <- 0L until 3L)
      AnnIngest.ingestBatch(
        emb.filter(pmod(col("vec_id"), lit(3)) === b), b, s"$aroot/store")
    AnnIngest.consolidate(spark, s"$aroot/store", s"$aroot/index",
      pqIters = 1)

    val k = Retrieval.K
    val nQ = Retrieval.NQueries
    val lexGrown = IndexStore.bm25FromIndex(docs, spark, s"$proot/index",
        nQ, Retrieval.QueryLen, k)
      .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val dense = AnnIngest.searchGrown(emb, spark, s"$aroot/index",
        nQueries = nQ, k = k)
      .select(col("query_id").as("q_id"),
        col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
    val fusedGrown = Retrieval.rrfFuse(lexGrown, dense, k)
      .select("q_id", "doc_id", "rank")
      .orderBy("q_id", "rank").collect()

    // reference: one-shot lexical leg, same dense leg
    val lexOne = Retrieval.bm25TopK(docs, nQ, Retrieval.QueryLen, k)
      .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val fusedRef = Retrieval.rrfFuse(lexOne, dense, k)
      .select("q_id", "doc_id", "rank")
      .orderBy("q_id", "rank").collect()
    assert(fusedGrown.sameElements(fusedRef),
      "growth of the lexical store must be invisible to the fusion")

    // the grown dense leg holds the IVFADC family's recall bar
    val denseOk = Similarity.annRecall(
        dense.select(col("q_id").as("query_id"),
          col("doc_id").as("neighbor_id")),
        Similarity.cosineTopK(emb, nQueries = nQ, k = k),
        Retrieval.AnnDenseMinRecall)
      .select("recall_ok").collect()
    assert(denseOk.nonEmpty && denseOk.forall(_.getBoolean(0)),
      "grown dense leg must clear the family recall bound")

    // a takedown issued against BOTH stores is consistent through the
    // fusion: the doc can never reach a fused result from either leg
    import spark.implicits._
    val victim = fusedGrown
      .map(_.getLong(1)).find(_ >= nQ)
      .getOrElse(fail("fused results must rank a non-query doc"))
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, s"$proot/index")
    AnnIngest.tombstone(Seq(victim).toDF("vec_id"), 0L, s"$aroot/index")
    val lexAfter = IndexStore.bm25FromIndex(docs, spark, s"$proot/index",
        nQ, Retrieval.QueryLen, k)
      .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val denseAfter = AnnIngest.searchGrown(emb, spark, s"$aroot/index",
        nQueries = nQ, k = k)
      .select(col("query_id").as("q_id"),
        col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
    val fusedAfter = Retrieval.rrfFuse(lexAfter, denseAfter, k)
    assert(fusedAfter.filter(col("doc_id") === victim).count() == 0,
      "a cross-store takedown must be invisible to the fused ranking")
    assert(fusedAfter.count() > 0)

    // the SAME takedown reaches the third grown index: the dead doc
    // stops MATCHING as a near-dup candidate, so a fresh copy of its
    // content is ADMITTED rather than suppressed as a duplicate of
    // something that no longer exists — the full deletion path in one
    // motion (retrieval can't find it, dedup can't cite it)
    val droot = tmp("hyb-dedup")
    DedupIngest.ingestBatch(docs, 0L, s"$droot/store")
    DedupIngest.consolidate(spark, s"$droot/store", s"$droot/index")
    DedupIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, s"$droot/index")
    val freshCopy = docs.filter(col("doc_id") === victim)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val pairs = DedupIngest.dedupAgainstIndex(
      freshCopy, docs, spark, s"$droot/index", 0.5)
    assert(pairs.filter(col("corpus_id") === victim).isEmpty,
      "a taken-down doc must never be cited as the duplicate of new content")
  }

  test("as-of hybrid: both legs pinned to one watermark reproduce the " +
      "eval exactly as it ran then, with no future leakage") {
    val proot = tmp("asof-postings")
    val aroot = tmp("asof-ann")
    val earlyDocs = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
    val earlyEmb = emb.filter(pmod(col("vec_id"), lit(3)) =!= 2)
    val k = Retrieval.K
    val nQ = Retrieval.NQueries
    // phase 1: the early corpus lands in both stores
    PostingsIngest.ingestBatch(earlyDocs, 0L, s"$proot/store")
    PostingsIngest.consolidate(spark, s"$proot/store", s"$proot/index")
    val lexWm = PostingsIngest.consolidatedThrough(spark, s"$proot/index").get
    AnnIngest.ingestBatch(earlyEmb, 0L, s"$aroot/store")
    AnnIngest.consolidate(spark, s"$aroot/store", s"$aroot/index", pqIters = 1)
    val denseWm = AnnIngest.consolidatedThrough(spark, s"$aroot/index").get
    def lex(asOf: Option[Long]) =
      IndexStore.bm25FromIndex(earlyDocs, spark, s"$proot/index",
          nQ, Retrieval.QueryLen, k, asOfGen = asOf)
        .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    def dense(asOf: Option[Long]) =
      AnnIngest.searchGrown(earlyEmb, spark, s"$aroot/index",
          nQueries = nQ, k = k, asOfGen = asOf)
        .select(col("query_id").as("q_id"),
          col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
    // the eval AS IT RAN at the watermark — captured before any growth
    val atTheTime = Retrieval.rrfFuse(lex(None), dense(None), k)
      .select("q_id", "doc_id", "rank").orderBy("q_id", "rank").collect()
    // phase 2: the rest of the corpus arrives in both stores
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), 1L, s"$proot/store")
    PostingsIngest.consolidate(spark, s"$proot/store", s"$proot/index")
    AnnIngest.ingestBatch(
      emb.filter(pmod(col("vec_id"), lit(3)) === 2), 1L, s"$aroot/store")
    AnnIngest.consolidate(spark, s"$aroot/store", s"$aroot/index", pqIters = 1)
    // reproduce last week's eval: both legs pinned to their watermark
    val reproduced = Retrieval.rrfFuse(lex(Some(lexWm)), dense(Some(denseWm)), k)
      .select("q_id", "doc_id", "rank").orderBy("q_id", "rank").collect()
    assert(reproduced.sameElements(atTheTime),
      "the as-of fusion must be bit-equal to the eval as it ran at the watermark")
    // no future leakage: every fused doc existed at the snapshot
    val earlyIds = earlyDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reproduced.forall(r => earlyIds(r.getLong(1))),
      "a snapshot eval must never surface a doc ingested after the watermark")
    // the latest read meanwhile serves the grown corpus
    assert(Retrieval.rrfFuse(lex(None), dense(None), k).count() > 0)
  }
}
