package graft.streaming

import graft.operators.{IndexStore, Retrieval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Growing BM25 store — the continuous form of
  * [[graft.operators.IndexStore.buildPostingsIndex]] (fresh crawl
  * batches join the searchable corpus forever, the retrieval twin of
  * [[DocIngest]]'s near-dup flow).
  *
  * Each micro-batch of (doc_id, text):
  *   1. appends its postings (doc_id, tok, tf, dl) into the store's
  *      `batch_id=` partition — the [[EventStreams.idempotentParquetSink]]
  *      exactly-once layout, so an at-least-once replay overwrites
  *      only itself;
  *   2. appends ONE (n, sumdl) stats row the same way — corpus
  *      statistics are a sum over batch rows, never a rescan.
  *
  * Probes ([[bm25FromStore]]) prune with a broadcast of the query
  * terms at the scan and re-derive df from the pruned hits (docs
  * containing term), so search cost scales with the query terms'
  * posting lists. The hot store is batch-partitioned, not
  * token-partitioned — directory pruning by term arrives through
  * offline [[consolidate]], which folds every committed batch into
  * the pb-partitioned artifact layout; after a consolidation, probes
  * switch to [[IndexStore.bm25FromIndex]] (static pb isin). The
  * ingest contract is the docs store's: each doc_id arrives in
  * exactly one batch.
  *
  * At 100 TB: state is parquet only (stateless query), a batch's
  * postings write shuffles nothing (map-combined per-batch tf), the
  * stats fold reads one tiny row per batch, and consolidation is the
  * same maintenance window every `batch_id=` forest already needs
  * ([[Compaction]]).
  */
object PostingsIngest {

  /** One micro-batch step, exposed for spec-level direct use. */
  def ingestBatch(batch: DataFrame, batchId: Long, path: String): Unit = {
    // the batch feeds the postings explode AND the stats fold — pin so
    // the (possibly expensive) stream source is consumed once
    val b = graft.core.Materialize.pin(batch)
    EventStreams.idempotentParquetSink(s"$path/postings")(
      Retrieval.postings(b), batchId)
    EventStreams.idempotentParquetSink(s"$path/stats")(
      Retrieval.corpusStats(b), batchId)
  }

  def start(docStream: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, path))
      .start()

  /** BM25 top-k against everything ingested so far. Stats are the sum
    * of the per-batch rows; df comes from the query-term-pruned hits
    * exactly as the inline gate derives it, so a store grown from any
    * batch split of a corpus answers identically to the one-shot
    * query over that corpus (PostingsIngestSpec pins this). */
  def bm25FromStore(spark: SparkSession, path: String,
      qterms: Seq[(Long, String)], k: Int = Retrieval.K,
      maxDf: Option[Long] = None): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum("n").cast("long").as("n"),
        sum("sumdl").cast("long").as("sumdl"))
    val toks = qterms.map(_._2).distinct
    val tokDf = spark.createDataFrame(toks.map(Tuple1(_))).toDF("tok")
    val hits = spark.read.parquet(s"$path/postings")
      .join(broadcast(tokDf), Seq("tok"))
      .select("doc_id", "tok", "tf", "dl")
    val dfT = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    Retrieval.bm25Rank(hits, dfT, qterms, stats, k, maxDf)
  }

  /** Offline maintenance: fold the whole `batch_id=` forest into the
    * pb-partitioned artifact triple at `indexPath` — postings laid
    * out for planning-time term pruning, dictionary derived from the
    * full postings, stats from the per-batch fold, pb_mod stamped.
    * The result is bit-compatible with
    * [[IndexStore.buildPostingsIndex]] over the same corpus, so
    * [[IndexStore.bm25FromIndex]] serves it unchanged. */
  def consolidate(spark: SparkSession, path: String, indexPath: String,
      pbMod: Int = IndexStore.PostingsPbMod): Unit = {
    val p = spark.read.parquet(s"$path/postings").drop("batch_id")
      .withColumn("pb",
        pmod(xxhash64(col("tok")), lit(pbMod.toLong)).cast("int"))
    p.write.mode("overwrite").partitionBy("pb").parquet(s"$indexPath/postings")
    p.groupBy("tok").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$indexPath/dict")
    spark.read.parquet(s"$path/stats")
      .agg(sum("n").cast("long").as("n"),
        sum("sumdl").cast("long").as("sumdl"))
      .withColumn("pb_mod", lit(pbMod))
      .write.mode("overwrite").parquet(s"$indexPath/stats")
  }

  // ---- driver gate row ------------------------------------------------

  /** Gate query (`x_text_bm25_grown`): pump `documents` into a fresh
    * store in three deterministic batches, consolidate into the
    * artifact layout, and search through [[IndexStore.bm25FromIndex]]
    * — hash-matching the one-shot BM25 oracle proves the whole grow →
    * consolidate → serve cycle lost and duplicated nothing. Fresh
    * store per call, the [[Compaction.compactionGate]] discipline. */
  val grownGate: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = s"${sys.props("java.io.tmpdir")}/graft_postings/gate_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true)
    val docs = graft.core.Tables.t(s, dir, "documents")
    for (b <- 0L until 3L)
      ingestBatch(docs.filter(pmod(col("doc_id"), lit(3)) === b), b, s"$root/store")
    consolidate(s, s"$root/store", s"$root/index")
    IndexStore.bm25FromIndex(docs, s, s"$root/index",
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("x_text_bm25_grown" -> grownGate)

  /** Output-identical to the inline gate by construction — shares its
    * oracle. */
  val oracles: Map[String, String] =
    Map("x_text_bm25_grown" -> Retrieval.oracles("x_text_bm25"))
}
