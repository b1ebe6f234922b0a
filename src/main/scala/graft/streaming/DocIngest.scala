package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Growing-index streaming ingest — the continuous form of the daily
  * near-dup flow ([[graft.operators.Dedup.minhashLshIncrementalIndexed]],
  * reference workload: fresh crawl batches arriving forever).
  *
  * Each micro-batch of (doc_id, source, text):
  *   1. is matched against ALL previously ingested docs through the
  *      accumulated parquet band index (broadcast batch bands probe
  *      the index; only candidates are verified with exact Jaccard —
  *      the corpus is never re-shingled),
  *   2. has its verified pairs, its docs, and its bands written to
  *      their stores, each into a `batch_id=<id>` partition with
  *      dynamic partition overwrite (the
  *      [[EventStreams.idempotentParquetSink]] exactly-once layout).
  *
  * Replay safety: foreachBatch is at-least-once — a crashed batch is
  * replayed with the SAME batchId. Two properties make the replay a
  * true no-op: (a) every write targets the replayed batch's own
  * partition, so it overwrites only itself; (b) the corpus/index reads
  * FILTER OUT the current batchId, so a replay whose first attempt
  * already appended its docs does not match the batch against itself
  * (self-pairs at jaccard 1.0 would otherwise appear only on the
  * retry path — the nastiest kind of once-in-a-blue-moon corruption).
  *
  * At 100 TB: state lives entirely in parquet (no streaming state
  * store — the query is stateless), the per-batch broadcast is
  * batch-sized, and the index probe is an equi-join on (band, bh)
  * over the flat `batch_id=` band forest — it partition-prunes
  * nothing, which is fine while the corpus fits a shuffle-free scan.
  * When it outgrows one, the probe's grown replacement EXISTS:
  * [[DedupIngest]] consolidates bands into a pbh-partitioned
  * generation forest with statically-pruned probes, tombstones, and
  * rebase (DedupIngestSpec pins the streaming dedup-on-ingest loop
  * end-to-end against it). Compaction of this module's `batch_id=`
  * forest is the usual offline concern (`Compaction.compact`).
  */
object DocIngest {

  val PairsSchema: StructType = StructType(Seq(
    StructField("new_id", LongType), StructField("corpus_id", LongType),
    StructField("jaccard", DoubleType)))

  private def exists(df: DataFrame, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(df.sparkSession.sessionState.newHadoopConf()).exists(hp)
  }

  /** One micro-batch step, exposed for spec-level direct use: pairs of
    * `batch` vs the docs accumulated in `docsPath`/`indexPath` from
    * OTHER batches, then idempotent appends of pairs, docs, and bands. */
  def ingestBatch(batch: DataFrame, batchId: Long, docsPath: String,
      indexPath: String, pairsPath: String, minJaccard: Double): Unit = {
    val s = batch.sparkSession
    // the batch feeds pair generation AND two appends — pin it so the
    // (possibly expensive) stream source is consumed once; fanned out
    // first so a single-split source doesn't serialize every consumer
    // in one task (no-op when the batch already feeds the cores)
    val b = graft.core.Materialize.pin(
      graft.core.Fanout.bySize(batch, org.apache.spark.sql.functions.col("doc_id")))
    // committed batches may have been moved to the pruned bulk tier
    // ([[tierIndexStore]]); it holds only ids below the replay
    // watermark, so it needs no own-batch exclusion
    val tier = Compaction.loadTierWithMod(s, indexPath)
    val pairs =
      if (exists(b, docsPath) && (exists(b, indexPath) || tier.nonEmpty)) {
        val prior = col("batch_id") =!= batchId // replay: exclude own docs
        val corpus = s.read.parquet(docsPath).filter(prior)
          .select("doc_id", "text")
        // a fully-tiered flat store has a root dir but no partitions
        // left — unreadable IS empty for the tail
        val tail =
          try s.read.parquet(indexPath).filter(prior)
            .select("doc_id", "band", "bh")
          catch { case _: org.apache.spark.sql.AnalysisException =>
            s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("doc_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("band",
                  org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("bh",
                  org.apache.spark.sql.types.LongType))))
          }
        val bands = tier match {
          case None => tail
          case Some((t, mod)) =>
            // probe pruning: the batch's own band hashes pick the pb
            // dirs to read (one tiny driver collect)
            val pbs = Dedup.minhashBands(b)
              .select(pmod(col("bh"), lit(mod.toLong)).as("pb"))
              .distinct().collect().map(_.getLong(0))
            tail.unionByName(
              t.filter(col("pb").isin(pbs.map(java.lang.Long.valueOf): _*))
                .select("doc_id", "band", "bh"))
        }
        Dedup.minhashLshIncrementalIndexed(b, corpus, bands, minJaccard)
      } else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        PairsSchema)
    EventStreams.idempotentParquetSink(pairsPath)(pairs, batchId)
    EventStreams.idempotentParquetSink(docsPath)(b, batchId)
    EventStreams.idempotentParquetSink(indexPath)(Dedup.minhashBands(b), batchId)
  }

  /** Offline maintenance, identical contract to
    * [[VecIngest.compactStores]]: fold each store's small
    * per-micro-batch partitions into one segment below the stream's
    * replay watermark. Run between ingest sessions only; the pairs
    * store may have nothing to compact (zero-pair batches write no
    * partition) — its entry is then None. */
  def compactStores(spark: org.apache.spark.sql.SparkSession, docsPath: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Map[String, Option[Compaction.CompactionStats]] = {
    val safe = Compaction.safeBelowFromCheckpoint(spark, checkpointDir)
    Map("docs" -> docsPath, "index" -> indexPath, "pairs" -> pairsPath)
      .map { case (k, p) =>
        k -> Compaction.compact(spark, p, safe, targetFileBytes) }
  }

  /** Default partition-key modulus for the band index's bulk tier —
    * see [[VecIngest.IndexTierMod]] for the sizing reasoning (must be
    * large vs a batch's band count or nothing prunes). */
  val IndexTierMod = 1024

  /** Offline maintenance, stronger form for the BAND-INDEX store:
    * move its committed batches into the pruned bulk tier at
    * `<indexPath>_tier`, laid out as `pb = bh mod` [[IndexTierMod]]
    * dirs that probes prune — caps per-batch probe cost at
    * replay-window + matching-pb size instead of O(corpus). Same
    * stamped-mod / recoverTier contract as
    * [[VecIngest.tierIndexStore]]. */
  def tierIndexStore(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, checkpointDir: String,
      pbMod: Int = IndexTierMod): Option[Compaction.TierStats] = {
    Compaction.requireTierMod(spark, indexPath, pbMod, stampIfNew = true)
    Compaction.tierByKey(spark, indexPath, s"${indexPath}_tier",
      Compaction.safeBelowFromCheckpoint(spark, checkpointDir),
      pmod(col("bh"), lit(pbMod.toLong)))
  }

  /** Start the ingest stream. `docStream` must carry at least
    * (doc_id, text); extra columns ride along into the docs store. */
  def start(docStream: DataFrame, docsPath: String, indexPath: String,
      pairsPath: String, checkpointDir: String,
      minJaccard: Double = 0.5): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, docsPath, indexPath, pairsPath, minJaccard))
      .start()
}
