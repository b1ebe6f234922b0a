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
    // layout: pb directories exist, stamped mod readable from the
    // index-root marker (stats are per-generation rows, no pb_mod col)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val idxFs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    assert(graft.core.Markers.read(idxFs,
      new org.apache.hadoop.fs.Path(idxPath, "_pb_mod")).get.toInt == 8)
    assert(spark.read.parquet(s"$idx/stats").columns.contains("gen"),
      "grown-layout stats must be keyed by generation for as-of serving")
    assert(spark.read.parquet(s"$idx/postings").select("pb").distinct().count() > 1,
      "consolidation must produce the token-partitioned layout")
  }

  test("re-consolidation folds ONLY batches past the watermark into a new generation") {
    val store = tmp("pstore6")
    val idx = tmp("pidx6")
    for (b <- 0L until 2L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(1L))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def snap(p: String): Set[(String, Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val b = Set.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        b += ((s.getPath.toString, s.getLen, s.getModificationTime))
      }
      b.result()
    }
    val gen1Before = snap(s"$idx/postings/gen=1")
    // grow the store, consolidate again
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), 2L, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(2L))
    // the prior generation is byte-untouched (paths, sizes, mtimes)
    assert(snap(s"$idx/postings/gen=1") == gen1Before,
      "re-consolidation must never rewrite a prior generation")
    // the new generation holds exactly the new batch's postings
    val g2 = spark.read.parquet(s"$idx/postings")
      .filter(col("gen") === 2).count()
    val batch2 = Retrieval.postings(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2)).count()
    assert(g2 == batch2, "gen=2 must contain only the newly-folded batch")
    // and serving through the grown index equals the one-shot answer
    val probe = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    // the static pb prune must survive the two-level gen/pb layout —
    // partition pruning on pb applies within every generation
    val scans = probe.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains(idx)).mkString("\n")
    assert(scans.contains("PartitionFilters: [pb"),
      s"gen-layout postings scan must keep the pb partition filter:\n$scans")
    val served = probe.orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot),
      "incrementally-grown index must serve the one-shot answer")
    // idempotence: a third call with nothing new is a complete no-op
    val allBefore = snap(idx)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    assert(snap(idx) == allBefore, "watermark-current consolidate must be a no-op")
    // and the structural pb_mod guard refuses a mid-life change
    val e = intercept[IllegalArgumentException] {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === 0), 3L, store)
      PostingsIngest.consolidate(spark, store, idx, pbMod = 16)
    }
    assert(e.getMessage.contains("pb_mod"))
  }

  test("a consolidation crash before the watermark write rolls forward without duplicating") {
    val store = tmp("pstore8")
    val idx = tmp("pidx8")
    for (b <- 0L until 2L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    // simulate the crash window: gen=1 is installed but the watermark
    // write never happened
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_through"), false)
    assert(PostingsIngest.consolidatedThrough(spark, idx).isEmpty)
    // new data arrives before anyone retries
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), 2L, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(2L))
    // the retried run must fold batches 0..1 ZERO more times: the
    // postings forest holds each (doc, tok) exactly once
    val dups = spark.read.parquet(s"$idx/postings")
      .groupBy("doc_id", "tok").count().filter(col("count") > 1).count()
    assert(dups == 0, "crash retry must not re-fold batches a generation already covers")
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot), "recovered index must serve the one-shot answer")
  }

  test("rebase folds the gen forest into one generation; crash mid-swap recovers both ways") {
    val store = tmp("pstore9")
    val idx = tmp("pidx9")
    for (b <- 0L until 3L) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
      PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    }
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def gens() = fs.listStatus(new org.apache.hadoop.fs.Path(idx, "postings"))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens() == Seq("gen=0", "gen=1", "gen=2"),
      s"three minor runs must leave three generations, got ${gens()}")
    val before = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    PostingsIngest.rebase(spark, idx)
    assert(gens() == Seq("gen=2"), s"rebase must leave one generation, got ${gens()}")
    val after = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(after.sameElements(before), "rebase must not change served results")
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(2L))
    // crash simulation: forest retired to trash, install never happened
    // (the worst window — genRoot missing). Rebase must roll BACK from
    // trash (no stamped scratch), and consolidate must refuse until then.
    val genRoot = new org.apache.hadoop.fs.Path(idx, "postings")
    val trash = new org.apache.hadoop.fs.Path(idx, ".rebase-old-postings")
    require(fs.rename(genRoot, trash))
    val e = intercept[IllegalArgumentException] {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === 0), 3L, store)
      PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    }
    assert(e.getMessage.contains("rebase recovery state"))
    PostingsIngest.rebase(spark, idx) // recovery prologue restores, then no-op
    assert(gens() == Seq("gen=2"), "roll-back must restore the live forest")
    val recovered = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(recovered.sameElements(before), "recovered index must serve identically")
  }

  test("an empty batch writes clean zero stats, never nulls") {
    val store = tmp("pstore7")
    PostingsIngest.ingestBatch(docs.filter(col("doc_id") < 5), 0L, store)
    PostingsIngest.ingestBatch(docs.filter(lit(false)), 1L, store)
    val st = spark.read.parquet(s"$store/stats").collect()
    assert(st.length == 2)
    assert(st.forall(r => !r.isNullAt(r.fieldIndex("n"))
        && !r.isNullAt(r.fieldIndex("sumdl"))),
      "an empty replayed batch must write (0, 0), not (0, NULL) — the " +
        "store row is consumed by folds that may not null-skip")
    val empty = spark.read.parquet(s"$store/stats")
      .filter(col("batch_id") === 1).head()
    assert(empty.getLong(empty.fieldIndex("n")) == 0L
      && empty.getLong(empty.fieldIndex("sumdl")) == 0L)
  }

  test("an EMPTY batch consolidates incrementally without breaking the forest") {
    val store = tmp("pstore10")
    val idx = tmp("pidx10")
    PostingsIngest.ingestBatch(docs.filter(pmod(col("doc_id"), lit(2)) === 0), 0L, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    // an idle micro-batch window: nothing arrived, the batch is empty
    PostingsIngest.ingestBatch(docs.filter(lit(false)), 1L, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(1L),
      "the watermark must advance past an empty batch")
    PostingsIngest.ingestBatch(docs.filter(pmod(col("doc_id"), lit(2)) === 1), 2L, store)
    PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot),
      "an empty generation must be invisible to serving")
  }

  test("doc tombstones hide immediately; the purging rebase converges " +
      "the index bit-exactly to the one-shot answer over the survivors") {
    import spark.implicits._
    val store = tmp("pstore-del")
    val idx = tmp("pidx-del")
    for (b <- 0L until 3L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    PostingsIngest.consolidate(spark, store, idx)
    val before = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    // victim: a ranked doc that is NOT a query doc, so the query set
    // is identical before and after the takedown
    val victim = before.filter(col("doc_id") >= Retrieval.NQueries)
      .select("doc_id").head().getLong(0)
    // tombstone in TWO batches (one a duplicate request) plus a
    // never-ingested id — dl dedupe and the no-op path both exercised
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    PostingsIngest.tombstoneDocs(Seq(victim, 999999L).toDF("doc_id"), 1L, idx)
    val hidden = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    assert(hidden.filter(col("doc_id") === victim).count() == 0,
      "a committed tombstone must hide the doc from every result")
    assert(hidden.count() > 0)
    val alive = docs.filter(col("doc_id") =!= victim)
    val oneShot = Retrieval.bm25TopK(alive).orderBy("q_id", "rank").collect()
    // ZERO DRIFT: bit-equality with the one-shot alive-corpus answer
    // holds IMMEDIATELY — df corrected from the probe's own dead
    // hits, (n, sumdl) from the dl the tombstone batch recorded
    val immediate = IndexStore.bm25FromIndex(alive, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(immediate.sameElements(oneShot),
      "serve must be bit-equal to the one-shot alive-corpus answer " +
        "from the tombstone commit, before any rebase")
    // the purging rebase reclaims space and retires the corrections
    PostingsIngest.rebase(spark, idx)
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot),
      "after the purging rebase the grown index must be bit-equal to " +
        "a one-shot build over the surviving corpus (df AND stats)")
    // physically gone, and a re-ingest cannot resurrect it
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") === victim).count() == 0)
    PostingsIngest.ingestBatch(docs.filter(col("doc_id") === victim), 3L, store)
    PostingsIngest.consolidate(spark, store, idx)
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") === victim).count() == 0,
      "encode must skip a re-added tombstoned doc")
    // the takedown anti-join must ride the broadcast path — a
    // sort-merge leftanti against the postings scan would put the
    // whole takedown feature on the shuffle bill
    val plan = IndexStore.bm25FromIndex(alive, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"tombstone-filtered probe must stay broadcast-only:\n$plan")
  }

  test("a TOTAL takedown purges to an empty-but-healthy index that can " +
      "grow again") {
    import spark.implicits._
    val store = tmp("pstore-total")
    val idx = tmp("pidx-total")
    PostingsIngest.ingestBatch(docs, 0L, store)
    PostingsIngest.consolidate(spark, store, idx)
    PostingsIngest.tombstoneDocs(docs.select("doc_id"), 0L, idx)
    PostingsIngest.rebase(spark, idx)
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    assert(served.count() == 0, "everything is deleted — nothing may rank")
    // the store grows again with FRESH docs and serving resumes
    val fresh = docs.withColumn("doc_id", col("doc_id") + 500000L)
    PostingsIngest.ingestBatch(fresh, 1L, store)
    PostingsIngest.consolidate(spark, store, idx)
    val revived = IndexStore.bm25FromIndex(fresh, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(fresh).orderBy("q_id", "rank").collect()
    assert(revived.sameElements(oneShot),
      "post-total-takedown regrowth must serve the one-shot answer " +
        "over the fresh corpus (dict and stats rebuilt clean)")
  }

  test("maintain runs the whole runbook and keeps serving the one-shot " +
      "answer") {
    val store = tmp("pstore-maint")
    val idx = tmp("pidx-maint")
    for (b <- 0L until 4L) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(4)) === b), b, store)
      PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 2)
    }
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/postings"))
      .map(_.getPath.getName).count(_.startsWith("gen="))
    assert(gens <= 2, s"maintain must bound the gen count, got $gens")
    val storeDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/postings"))
      .map(_.getPath.getName).count(_.startsWith("batch_id="))
    assert(storeDirs < 4,
      s"maintain must compact the covered hot store, got $storeDirs dirs")
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot),
      "maintenance cycles must preserve the one-shot answer bit-exactly")
  }

  test("as-of serving answers exactly as the index did at that " +
      "watermark — stats, df, and takedowns all scoped to the snapshot") {
    import spark.implicits._
    val store = tmp("pstore-asof")
    val idx = tmp("pidx-asof")
    val early = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
    for (b <- 0L until 2L)
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
    PostingsIngest.consolidate(spark, store, idx)
    val wm0 = PostingsIngest.consolidatedThrough(spark, idx).get
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), 2L, store)
    PostingsIngest.consolidate(spark, store, idx)
    // the snapshot answers bit-exactly as a one-shot over the early
    // corpus: leaf dirs, df, and (n, sumdl) all scoped by gen
    val asOf = IndexStore.bm25FromIndex(early, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K,
        asOfGen = Some(wm0))
      .orderBy("q_id", "rank").collect()
    val oneShotEarly = Retrieval.bm25TopK(early)
      .orderBy("q_id", "rank").collect()
    assert(asOf.sameElements(oneShotEarly),
      "as-of must serve the exact one-shot answer over the snapshot corpus")
    // the latest read is unaffected
    val latest = IndexStore.bm25FromIndex(docs, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(latest.sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
    // a takedown of an early doc reaches the snapshot too (no
    // resurrection), and the corrected snapshot stays bit-exact
    val victim = asOf.map(_.getLong(1)).find(_ >= Retrieval.NQueries).get
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    val earlyAlive = early.filter(col("doc_id") =!= victim)
    val asOfAlive = IndexStore.bm25FromIndex(earlyAlive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K,
        asOfGen = Some(wm0))
      .orderBy("q_id", "rank").collect()
    assert(asOfAlive.sameElements(
      Retrieval.bm25TopK(earlyAlive).orderBy("q_id", "rank").collect()),
      "the snapshot must exclude the takedown and stay bit-exact")
    // rebase does NOT collapse history: row-level src gens and the
    // per-src-gen sidecars survive the fold, so a snapshot older than
    // the fold point still serves bit-exactly (takedown included)
    PostingsIngest.rebase(spark, idx)
    val asOfAfterFold = IndexStore.bm25FromIndex(earlyAlive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K,
        asOfGen = Some(wm0))
      .orderBy("q_id", "rank").collect()
    assert(asOfAfterFold.sameElements(asOfAlive),
      "an asOf older than the fold point must keep serving its snapshot " +
        "bit-exactly after a rebase")
    // and the latest read is still the full (alive) corpus
    val allAlive = docs.filter(col("doc_id") =!= victim)
    assert(IndexStore.bm25FromIndex(allAlive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().sameElements(
        Retrieval.bm25TopK(allAlive).orderBy("q_id", "rank").collect()),
      "the latest read after a purging rebase must serve the one-shot " +
        "answer over the surviving corpus")
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
