package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval}
import graft.streaming.PostingsIngest

/** Growing BM25 store: a store grown from any batch split answers
  * identically to the one-shot query, replays are no-ops, and
  * consolidation produces the artifact layout bit-compatible with
  * the one-shot build. */
class PostingsIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("a store grown in batches answers exactly like the one-shot query") {
    val store = tmp("pstore")
    for (b <- 0L until 3L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    val qterms = Retrieval.queryTermsLocal(docs)
    val grown = PostingsIngest.bm25FromStore(spark, store, qterms)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(grown.sameElements(oneShot),
      "batch split must be invisible to the search result")
  }

  test("at-least-once replay of a committed batch changes nothing") {
    val store = tmp("pstore2")
    for (b <- 0L until 3L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    val qterms = Retrieval.queryTermsLocal(docs)
    val before = PostingsIngest.bm25FromStore(spark, store, qterms)
      .orderBy("q_id", "rank").collect()
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), 1L, store)
    val after = PostingsIngest.bm25FromStore(spark, store, qterms)
      .orderBy("q_id", "rank").collect()
    assert(after.sameElements(before),
      "replayed batch must overwrite only its own partition")
    // stats rows too: one per batch, not one per attempt
    assert(spark.read.parquet(s"$store/stats").count() == 3)
  }

  test("consolidate folds the forest into the artifact layout bm25FromIndex serves") {
    val store = tmp("pstore3")
    val idx = tmp("pidx3")
    for (b <- 0L until 3L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot),
      "consolidated artifact must serve the one-shot answer")
    // layout: pb directories exist, stamped mod readable
    assert(spark.read.parquet(s"$idx/stats").select("pb_mod").head().getInt(0) == 8)
    assert(spark.read.parquet(s"$idx/postings").select("pb").distinct().count() > 1,
      "consolidation must produce the token-partitioned layout")
  }

  test("streaming ingest through foreachBatch grows the searchable corpus") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("pstream")
    val input = MemoryStream[(Long, String)]
    val q = PostingsIngest.start(
      input.toDF().toDF("doc_id", "text"), store, tmp("pstream-ckpt"))
    try {
      input.addData((1L, "alpha beta gamma"), (2L, "delta beta"))
      q.processAllAvailable()
      input.addData((3L, "alpha alpha epsilon"))
      q.processAllAvailable()
      val qterms = Seq((1L, "alpha"))
      val hits = PostingsIngest.bm25FromStore(spark, store, qterms, k = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 3L),
        s"both alpha docs must be retrievable across batches, got $hits")
      // the doubled tf in doc 3 must outrank doc 1's single hit
      val ranked = PostingsIngest.bm25FromStore(spark, store, qterms, k = 10)
        .orderBy("rank").select("doc_id").head().getLong(0)
      assert(ranked == 3L, "higher-tf doc must rank first")
    } finally q.stop()
  }
}
