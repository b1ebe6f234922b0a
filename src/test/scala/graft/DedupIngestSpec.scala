package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DedupIngest

/** Growing MinHash band store: a grown index answers identically to
  * the inline incremental flow and the one-shot indexed flow, crash
  * windows never duplicate a band, probes prune statically, and
  * takedowns stop a deleted doc from ever matching again. */
class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def newDocs = docs.filter(col("doc_id") < 10)
  private def corpus = docs.filter(col("doc_id") >= 10)

  private val MinJ = 0.5

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def grow(store: String, idx: String, nB: Int = 2): Unit = {
    for (b <- 0L until nB.toLong)
      DedupIngest.ingestBatch(
        corpus.filter(pmod(col("doc_id"), lit(nB)) === b), b, store)
    DedupIngest.consolidate(spark, store, idx)
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("new_id"), col("corpus_id"),
        round(col("jaccard"), 9).as("j"))
      .orderBy("new_id", "corpus_id").collect()

  test("a grown band index answers exactly like the inline incremental " +
      "and the one-shot indexed flows") {
    val store = tmp("dstore")
    val idx = tmp("didx")
    grow(store, idx)
    val grown = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    val inline = pairsOf(
      Dedup.minhashLshIncremental(newDocs, corpus, MinJ))
    assert(grown.sameElements(inline),
      "the grown index must reproduce the inline incremental pairs exactly")
    assert(grown.nonEmpty, "fixture must produce at least one near-dup pair")
  }

  test("replay + crash-window re-consolidation never duplicates a band") {
    val store = tmp("dstore2")
    val idx = tmp("didx2")
    grow(store, idx)
    val before = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    // at-least-once replay of a committed batch overwrites only itself
    DedupIngest.ingestBatch(
      corpus.filter(pmod(col("doc_id"), lit(2)) === 1), 1L, store)
    // crash window: watermark lost after the gen install, new batch
    // arrives before the retry — the floor guard must fold ONLY the
    // new batch, not re-fold what the crashed gen already covers.
    // The late batch holds genuinely NEW docs (dedup-on-ingest: each
    // doc lives in exactly one batch) whose gibberish text matches
    // nothing, so the served pairs must be unchanged.
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_through"), false)
    DedupIngest.ingestBatch(
      Seq((100001L, "zq1 zq2 zq3 zq4 zq5"),
        (100002L, "yx1 yx2 yx3 yx4 yx5")).toDF("doc_id", "text"),
      2L, store)
    DedupIngest.consolidate(spark, store, idx)
    val bands = spark.read.parquet(s"$idx/bands")
    assert(bands.groupBy("doc_id", "band").count()
        .filter(col("count") > 1).isEmpty,
      "no (doc, band) row may appear twice after a crash-window retry")
    val after = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    assert(after.sameElements(before),
      "replay + re-consolidation must not change the served pairs")
  }

  test("the probe prunes to the new batch's pbh partitions at planning time") {
    val store = tmp("dstore3")
    val idx = tmp("didx3")
    grow(store, idx)
    // the served probe pins its candidate frame (localCheckpoint runs
    // the subtree eagerly), so the shape under audit is the candidate
    // COMPOSITION the way dedupAgainstIndex builds it, pre-pin
    val newBands = Dedup.minhashBands(newDocs)
    val cand = DedupIngest.corpusBandsFromIndex(spark, idx, newBands)
      .join(broadcast(newBands.select(col("doc_id").as("new_id"),
        col("band"), col("bh"))), Seq("band", "bh"))
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [pbh"),
      s"band-index scan must carry a static pbh partition filter:\n$plan")
    // candidate generation must BROADCAST the batch side against the
    // pruned index scan — that is the join that would otherwise
    // shuffle the index. (The verification joins are candidate-sized
    // on both sides and may legitimately shuffle at scale.)
    assert(plan.contains("BroadcastHashJoin"),
      "the (band, bh) candidate join must broadcast the batch side")
    assert(!plan.contains("SortMergeJoin"),
      "candidate generation must not shuffle the index")
  }

  test("tombstoned docs stop matching immediately; the purging rebase " +
      "converges to the one-shot over survivors and re-adds stay dead") {
    val store = tmp("dstore4")
    val idx = tmp("didx4")
    grow(store, idx)
    val before = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    assert(before.nonEmpty)
    val victim = before.head.getLong(1)
    DedupIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    val survivors = corpus.filter(col("doc_id") =!= victim)
    val hidden = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    assert(!hidden.exists(_.getLong(1) == victim),
      "a tombstoned doc must never surface as a candidate after commit")
    assert(hidden.sameElements(pairsOf(
      Dedup.minhashLshIncremental(newDocs, survivors, MinJ))),
      "serve must equal the inline flow over the surviving corpus")
    DedupIngest.rebase(spark, idx)
    assert(spark.read.parquet(s"$idx/bands")
        .filter(col("doc_id") === victim).isEmpty,
      "the purging rebase must remove the tombstoned doc's bands from disk")
    assert(pairsOf(DedupIngest.dedupAgainstIndex(
        newDocs, corpus, spark, idx, MinJ)).sameElements(hidden),
      "the purge must not change served pairs — only reclaim space")
    // a re-ingested copy of the dead doc stays dead
    DedupIngest.ingestBatch(corpus.filter(col("doc_id") === victim), 5L, store)
    DedupIngest.consolidate(spark, store, idx)
    assert(!pairsOf(DedupIngest.dedupAgainstIndex(
        newDocs, corpus, spark, idx, MinJ)).exists(_.getLong(1) == victim),
      "takedown is permanent — a re-ingested dead id must not match")
  }

  test("streaming dedup-on-ingest: each batch matches only what came before") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{EventStreams, GenForest}
    val store = tmp("dstream")
    val idx = tmp("dstream-idx")
    val docsDir = tmp("dstream-docs")
    val pairsDir = tmp("dstream-pairs")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val fs = new org.apache.hadoop.fs.Path(docsDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val input = MemoryStream[(Long, String)]
    // the DocIngest loop over the GROWN index: probe against
    // everything ingested BEFORE this batch, persist the verified
    // pairs, then join the index — all through idempotent batch sinks
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", tmp("dstream-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val corpusSoFar =
          if (GenForest.hasDataFiles(fs, new org.apache.hadoop.fs.Path(docsDir)))
            spark.read.parquet(docsDir).select("doc_id", "text")
          else emptyDocs
        val pairs = DedupIngest.dedupAgainstIndex(
          batch, corpusSoFar, spark, idx, MinJ)
        EventStreams.idempotentParquetSink(pairsDir)(pairs, batchId)
        EventStreams.idempotentParquetSink(docsDir)(batch, batchId)
        DedupIngest.ingestBatch(batch, batchId, store)
        DedupIngest.consolidate(spark, store, idx)
      }
      .start()
    try {
      input.addData((1L, "a b c d e f"), (2L, "z y x w v u"))
      q.processAllAvailable()
      input.addData((3L, "a b c d e f"))
      q.processAllAvailable()
      input.addData((4L, "a b c d e g"), (5L, "m n o p q r"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(pairsDir)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 3 duplicates doc 1 (j=1.0); doc 4 shares 3 of 5 shingles
    // with both (j=0.6); docs 2 and 5 match nothing; batch-internal
    // pairs are not the probe's job (doc 1 vs 2 arrived together)
    assert(got == Set((3L, 1L), (4L, 1L), (4L, 3L)),
      s"streamed pair set wrong: $got")
  }

  test("pbhModForBands scales with the index, not the batch") {
    assert(DedupIngest.pbhModForBands(1000L) == 64, "gate floor")
    assert(DedupIngest.pbhModForBands(8L * 1000 * 1000) == 64,
      "1M docs x 8 bands still sits at the floor (~1M rows/dir)")
    assert(DedupIngest.pbhModForBands(512L * 1000 * 1000) == 512)
    assert(DedupIngest.pbhModForBands(Long.MaxValue / 4) == 4096,
      "listing-bill cap")
    intercept[IllegalArgumentException](DedupIngest.pbhModForBands(0))
  }

  test("maintain runs the runbook and an unconsolidated index serves empty") {
    val store = tmp("dstore5")
    val idx = tmp("didx5")
    // unconsolidated: the probe serves the contract schema, empty
    assert(DedupIngest.dedupAgainstIndex(
      newDocs, corpus, spark, idx, MinJ).isEmpty)
    for (b <- 0L until 3L)
      DedupIngest.ingestBatch(
        corpus.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    DedupIngest.maintain(spark, store, idx, rebaseAtGens = 1)
    val served = pairsOf(
      DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, MinJ))
    assert(served.sameElements(pairsOf(
      Dedup.minhashLshIncremental(newDocs, corpus, MinJ))),
      "maintenance must preserve the inline answer")
  }
}
