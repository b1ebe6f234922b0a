package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval, Similarity}
import graft.streaming.{AnnIngest, PostingsIngest}

/** Round-16 invariants: the grown-store serving story finished.
  *
  *   1. As-of df rides the per-src-gen dict DELTAS — the probe plan
  *      scans postings exactly once (hits), never again for df.
  *   2. The purging rebase has NO mixed-state read window: a serve
  *      interleaved between the sidecar rebuild and the fold is
  *      already bit-equal to the purged answer (cutoffs ride IN the
  *      sidecar rows).
  *   3. A crashed consolidate (gen installed, watermark lost) followed
  *      by a DIRECT rebase — not consolidate-first — duplicates
  *      nothing (r15 ADVICE: fold keyed at max(wm, maxGen)).
  *   4. tombstoneDocs refuses to commit under a held maintenance
  *      lease (r15 ADVICE: the mid-encode tombstone race, now an
  *      enforced mutual exclusion instead of a documented caveat).
  *   5. A data-bearing forest with missing sidecars fails LOUDLY at
  *      serve time instead of scoring with zero stats (r15 ADVICE).
  *   6. The ANN codes forest keeps serving pre-fold snapshots after a
  *      rebase (row-level src_gen + `_gens` markers — task #6's
  *      vector-store half).
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select("vec_id", "embedding")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def grow(store: String, idx: String, splits: Int = 2): Unit = {
    for (b <- 0L until splits.toLong) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(splits)) === b), b, store)
      PostingsIngest.consolidate(spark, store, idx)
    }
  }

  test("as-of df comes from the dict deltas: the probe plan scans " +
      "postings once, and the dict forest is in the plan") {
    val store = tmp("r16-dict")
    val idx = tmp("r16-dict-idx")
    grow(store, idx)
    val early = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val probe = IndexStore.bm25FromIndex(early, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K, asOfGen = Some(0L))
    val leaves = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    val postingsScans = leaves.count(_.contains("/postings"))
    assert(postingsScans == 1,
      s"as-of probe must scan postings exactly once (hits), got " +
        s"$postingsScans:\n${leaves.mkString("\n")}")
    assert(leaves.exists(_.contains("/dict")),
      "as-of df must come from the persisted dict deltas")
    // and it still serves the exact snapshot answer
    val served = probe.orderBy("q_id", "rank").collect()
    val oneShot = Retrieval.bm25TopK(early).orderBy("q_id", "rank").collect()
    assert(served.sameElements(oneShot))
  }

  test("a serve interleaved inside the purging rebase — after the " +
      "sidecar rebuild, before the fold — is already the purged answer") {
    val store = tmp("r16-window")
    val idx = tmp("r16-window-idx")
    grow(store, idx)
    val before = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    val victim = before.filter(col("doc_id") >= Retrieval.NQueries)
      .select("doc_id").head().getLong(0)
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    val alive = docs.filter(col("doc_id") =!= victim)
    val oneShot = Retrieval.bm25TopK(alive).orderBy("q_id", "rank").collect()
    // phase 1 of the purge ONLY: sidecars rebuilt (cutoffs advanced),
    // forest still holds the dead rows
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    PostingsIngest.rebuildPurgedSidecars(spark, idxPath, fs, tombMax = 0L)
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") === victim).count() > 0,
      "precondition: the fold has not run — dead rows still on disk")
    val midWindow = IndexStore.bm25FromIndex(alive, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(midWindow.sameElements(oneShot),
      "a reader between sidecar rebuild and fold must see the purged " +
        "answer — new sidecar content retires the corrections it absorbed")
    // and the COMPLETED purge serves the same thing
    PostingsIngest.rebase(spark, idx)
    val after = IndexStore.bm25FromIndex(alive, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(after.sameElements(oneShot))
  }

  test("a crashed consolidate (gen installed, watermark lost) followed " +
      "by a DIRECT rebase duplicates nothing") {
    val store = tmp("r16-fold")
    val idx = tmp("r16-fold-idx")
    grow(store, idx, splits = 2)
    // crash simulation: the second consolidate's watermark write was
    // lost, so maxGen(=1) > watermark(rolled back to 0)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.Markers.forceWrite(fs,
      new org.apache.hadoop.fs.Path(idxPath, "_through"), "0")
    // an operator fires rebase DIRECTLY (not via maintain)
    PostingsIngest.rebase(spark, idx)
    // the fold must land at gen=1 (max of wm, maxGen), so the retried
    // consolidate's floor sees batch 1 as covered
    PostingsIngest.consolidate(spark, store, idx)
    assert(PostingsIngest.consolidatedThrough(spark, idx).contains(1L))
    val dups = spark.read.parquet(s"$idx/postings")
      .groupBy("doc_id", "tok").count().filter(col("count") > 1).count()
    assert(dups == 0,
      "rebase keyed below the max gen would make the next consolidate " +
        "re-fold covered batches — every (doc, tok) must stay unique")
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(served.sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
  }

  test("tombstoneDocs refuses to commit while a maintenance lease is held") {
    val store = tmp("r16-lease")
    val idx = tmp("r16-lease-idx")
    grow(store, idx)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    val claim = new org.apache.hadoop.fs.Path(idxPath, "_consolidate_commit")
    assert(graft.core.Markers.tryCreate(fs, claim, "spec\nheld"))
    try {
      val e = intercept[IllegalStateException] {
        PostingsIngest.tombstoneDocs(Seq(1L).toDF("doc_id"), 0L, idx)
      }
      assert(e.getMessage.contains("in flight"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath, "tombstones")),
        "a refused tombstone must write nothing")
    } finally fs.delete(claim, false)
    // and it commits cleanly once the lease clears (releasing its own)
    PostingsIngest.tombstoneDocs(Seq(1L).toDF("doc_id"), 0L, idx)
    assert(!fs.exists(claim), "tombstoneDocs must release its lease")
  }

  test("a data-bearing forest with missing sidecars fails loudly at serve") {
    val store = tmp("r16-loud")
    val idx = tmp("r16-loud-idx")
    grow(store, idx)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(idxPath, "stats"), true)
    val e = intercept[IllegalArgumentException] {
      IndexStore.bm25FromIndex(docs, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K).collect()
    }
    assert(e.getMessage.contains("sidecars"),
      s"serving without stats must refuse, not score with zeros: $e")
    // rebase's reconcile pass heals the sidecars and serving resumes
    // (consolidate can't: its watermark is current, so it no-ops)
    PostingsIngest.rebase(spark, idx)
    val served = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect()
    assert(served.sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
  }

  test("compactSidecars bounds sidecar growth behind an explicit " +
      "horizon: latest and at-horizon as-of unchanged, pre-horizon " +
      "as-of refused, later takedowns stay zero-drift through the " +
      "bucketed corrections") {
    val store = tmp("r16-compact")
    val idx = tmp("r16-compact-idx")
    // three consolidations → three sidecar gens
    for (b <- 0L until 3L) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
      PostingsIngest.consolidate(spark, store, idx)
    }
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    // sidecar roots are pointer-versioned since r17 — resolve the live one
    def sidecarGens(root: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(
          PostingsIngest.sidecarRootPath(spark, idx, root)))
        .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(sidecarGens("dict").size == 3 && sidecarGens("stats").size == 3)
    def serve(corpus: org.apache.spark.sql.DataFrame,
        asOf: Option[Long] = None) =
      IndexStore.bm25FromIndex(corpus, spark, idx,
          Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K, asOfGen = asOf)
        .orderBy("q_id", "rank").collect()
    val latestBefore = serve(docs)
    PostingsIngest.compactSidecars(spark, idx)
    assert(PostingsIngest.sidecarHorizon(spark, idx) == 2L)
    assert(sidecarGens("dict") == Seq("gen=2") &&
      sidecarGens("stats") == Seq("gen=2"),
      "both sidecar forests must fold to one base generation")
    // latest and at-horizon snapshots are bit-identical across the fold
    assert(serve(docs).sameElements(latestBefore))
    assert(serve(docs, asOf = Some(2L)).sameElements(latestBefore))
    // a snapshot below the horizon refuses loudly — its deltas are gone
    val e = intercept[IllegalArgumentException] {
      serve(docs.filter(pmod(col("doc_id"), lit(3)) === 0), asOf = Some(0L))
    }
    assert(e.getMessage.contains("compacted"), s"got: $e")
    // the forest itself is untouched (sidecar compaction != rebase)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(idxPath, "postings"))
      .map(_.getPath.getName).count(_.startsWith("gen=")) == 3)
    // the critical new math: a takedown AFTER compaction corrects a
    // doc whose src gen (0) was folded away — the bucketed joins must
    // land its df/stats corrections on the base bucket, keeping the
    // zero-drift contract
    val victim = latestBefore
      .map(_.getLong(1)).find(_ >= Retrieval.NQueries).get
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    val alive = docs.filter(col("doc_id") =!= victim)
    val aliveOneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect()
    assert(serve(alive).sameElements(aliveOneShot),
      "post-compaction takedown must stay bit-equal to the one-shot " +
        "alive answer (corrections land on the folded base bucket)")
    // the purging rebase preserves the bucketing and the answer
    PostingsIngest.rebase(spark, idx)
    assert(sidecarGens("dict") == Seq("gen=2"),
      "a purge rebuild must keep folded history in its base bucket")
    assert(serve(alive).sameElements(aliveOneShot))
    // growth resumes per-gen ABOVE the horizon, and compacting again
    // folds the new history in
    PostingsIngest.ingestBatch(
      docs.filter(col("doc_id") === victim)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")),
      3L, store)
    PostingsIngest.consolidate(spark, store, idx)
    assert(sidecarGens("dict") == Seq("gen=2", "gen=3"))
    PostingsIngest.compactSidecars(spark, idx)
    assert(PostingsIngest.sidecarHorizon(spark, idx) == 3L)
    assert(sidecarGens("dict") == Seq("gen=3"))
    val grown = docs.select("doc_id", "text")
      .filter(col("doc_id") =!= victim)
      .unionByName(docs.filter(col("doc_id") === victim)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    assert(serve(grown).sameElements(
      Retrieval.bm25TopK(grown).orderBy("q_id", "rank").collect()),
      "re-compaction over regrown history must keep the latest serve exact")
  }

  test("the dedup probe picks its scan shape by predicted saved bytes — " +
      "flat below the break-even, explicit leaf dirs above — with " +
      "identical rows either way") {
    import graft.operators.Dedup
    import graft.streaming.DedupIngest
    val store = tmp("r16-dprobe")
    val idx = tmp("r16-dprobe-idx")
    val corpus = docs.filter(col("doc_id") >= 10)
    DedupIngest.ingestBatch(corpus, 0L, store)
    DedupIngest.consolidate(spark, store, idx)
    val newBands = graft.core.Materialize.pin(
      Dedup.minhashBands(docs.filter(col("doc_id") < 10)))
    def leafPaths(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        .filter(_.contains("/bands")).mkString("\n")
    // a gate-scale index saves far less than the default break-even:
    // the probe must take the whole-root shape (Catalyst still prunes
    // partitions via the isin — the scan LOCATION is the root)
    val flat = DedupIngest.corpusBandsFromIndex(spark, idx, newBands)
    assert(!leafPaths(flat).contains("pbh="),
      s"small-index probe must scan the root, not enumerate leaf dirs:\n${leafPaths(flat)}")
    assert(flat.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [pbh"),
      "the flat shape must still carry the static pbh partition filter")
    // forcing the break-even to zero forces the pruned shape: the scan
    // location is the explicit pbh leaf-dir list
    val pruned = DedupIngest.corpusBandsFromIndex(spark, idx, newBands,
      flatBelowSavedBytes = 0L)
    assert(leafPaths(pruned).contains("pbh="),
      s"above the break-even the probe must enumerate leaf dirs:\n${leafPaths(pruned)}")
    // and the two shapes return exactly the same bands
    val a = flat.orderBy("doc_id", "band").collect()
    val b = pruned.orderBy("doc_id", "band").collect()
    assert(a.nonEmpty && a.sameElements(b),
      "scan shape must never change the probe's answer")
  }

  test("ANN as-of keeps serving a pre-fold snapshot after rebase") {
    val store = tmp("r16-ann")
    val idx = tmp("r16-ann-idx")
    AnnIngest.ingestBatch(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0), 0L, store)
    AnnIngest.consolidate(spark, store, idx, pqIters = 1)
    val wm0 = AnnIngest.consolidatedThrough(spark, idx).get
    AnnIngest.ingestBatch(
      emb.filter(pmod(col("vec_id"), lit(2)) === 1), 1L, store)
    AnnIngest.consolidate(spark, store, idx, pqIters = 1)
    val snapBefore = AnnIngest.searchGrown(emb, spark, idx,
        nQueries = 6, k = 5, asOfGen = Some(wm0))
      .orderBy("query_id", "rank").collect()
    assert(snapBefore.nonEmpty)
    AnnIngest.rebase(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/index"))
      .map(_.getPath.getName).count(_.startsWith("gen="))
    assert(gens == 1, "precondition: the fold collapsed the dirs")
    val snapAfter = AnnIngest.searchGrown(emb, spark, idx,
        nQueries = 6, k = 5, asOfGen = Some(wm0))
      .orderBy("query_id", "rank").collect()
    assert(snapAfter.sameElements(snapBefore),
      "a rebase fold must not move the snapshot horizon — src_gen rows " +
        "inside the folded base keep pre-fold as-of reads exact")
    // sanity: the snapshot excludes the post-watermark half
    val lateIds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(snapAfter.forall(r => !lateIds(r.getLong(1))),
      "no future leakage through the folded base")
  }
}
