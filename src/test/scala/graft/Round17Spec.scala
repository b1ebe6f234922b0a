package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval}
import graft.streaming.PostingsIngest

/** Round-17 invariants: sidecar maintenance with no crash-ordering
  * knowledge and no wrong-answer read windows.
  *
  *   1. compactSidecars stamps the horizon BEFORE its folds (r16
  *      ADVICE, medium): a reader overlapping the fold window refuses
  *      as-of below the horizon instead of silently missing folded
  *      rows, and latest/at-horizon serves stay exact throughout.
  *   2. A crash between the two sidecar folds (stats swapped, dict
  *      not — r16 ADVICE, high) double-counts NOTHING on retry: the
  *      `_gens` coverage markers tell the reconcile which base
  *      buckets are real folds, and an under-covered one is rebuilt
  *      from the postings forest. Any maintenance entry point heals —
  *      no "retry compaction first" runbook ordering.
  *   3. Stale fold recovery state from the r16-era GenForest-rebase
  *      sidecar path can never win a later swap (sidecars are derived
  *      data: reconcile settles the recovery dirs by deletion).
  *   4. Sidecar roots are dir-versioned (atomic publish, resolve =
  *      max version) with keep-two-back retention: a reader that
  *      resolved its root just before a maintenance run scans one
  *      complete version through BOTH swaps the run can perform (the
  *      r16 delete→rename loud-failure window is gone).
  *   5. A takedown committed INTO a stamped-unfolded window keeps
  *      zero-drift: tombstoneDocs heals the sidecars under its own
  *      lease before committing (r17 review wave).
  *   6. maintain(sidecarKeepLast = Some(k)) bounds sidecar dir growth
  *      across blind timer cycles while keeping the newest k source
  *      generations individually serveable — as-of refuses only below
  *      the configured lag.
  *   7. The bloom prefilter probes through a codegen'd expression on
  *      both gate paths — no per-row scala-UDF boundary left.
  *   8. On-disk format guards: legacy unsuffixed rebase recovery dirs
  *      refuse loudly, and a gen forest without the src_gen row
  *      column refuses with a rebuild-your-index message instead of
  *      an opaque AnalysisException (r16 ADVICE, low).
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def grow(store: String, idx: String, splits: Int): Unit =
    for (b <- 0L until splits.toLong) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(splits)) === b), b, store)
      PostingsIngest.consolidate(spark, store, idx)
    }

  private def fsOf(idx: String) = {
    val p = new org.apache.hadoop.fs.Path(idx)
    (p, p.getFileSystem(spark.sessionState.newHadoopConf()))
  }

  private def serve(idx: String, corpus: org.apache.spark.sql.DataFrame,
      asOf: Option[Long] = None) =
    IndexStore.bm25FromIndex(corpus, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K, asOfGen = asOf)
      .orderBy("q_id", "rank").collect()

  private def sidecarGens(idx: String, root: String): Seq[String] = {
    val (_, fs) = fsOf(idx)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        PostingsIngest.sidecarRootPath(spark, idx, root)))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted.toSeq
  }

  test("a crash after the horizon stamp, before any fold: reads stay " +
      "exact (or refuse) through the window, and EITHER maintenance " +
      "entry point heals without ordering knowledge") {
    val store = tmp("r17-stamp")
    val idx = tmp("r17-stamp-idx")
    grow(store, idx, splits = 3)
    val latestBefore = serve(idx, docs)
    val (idxPath, fs) = fsOf(idx)
    // crash simulation: compactSidecars stamped its commit point and
    // died before folding anything — sidecars still per-gen
    PostingsIngest.stampSidecarHorizon(fs, idxPath, 2L)
    assert(sidecarGens(idx, "dict").size == 3, "precondition: no fold ran")
    // INSIDE the window: latest and at-horizon snapshots sum the
    // per-gen rows to the identical answer; below-horizon REFUSES —
    // under the r16 stamp-last ordering this read served silently
    // wrong zero-stats answers
    assert(serve(idx, docs).sameElements(latestBefore))
    assert(serve(idx, docs, asOf = Some(2L)).sameElements(latestBefore))
    val e = intercept[IllegalArgumentException] {
      serve(idx, docs, asOf = Some(0L))
    }
    assert(e.getMessage.contains("compacted"), s"got: $e")
    // heal via a DIFFERENT entry point than the one that crashed: the
    // rebase's reconcile pass rebuilds the base bucket from postings
    PostingsIngest.rebase(spark, idx)
    assert(sidecarGens(idx, "dict") == Seq("gen=2") &&
      sidecarGens(idx, "stats") == Seq("gen=2"),
      "reconcile must finish the compaction the stamp committed to")
    assert(PostingsIngest.sidecarHorizon(spark, idx) == 2L)
    assert(serve(idx, docs).sameElements(latestBefore))
    assert(serve(idx, docs, asOf = Some(2L)).sameElements(latestBefore))
  }

  test("a crash between the sidecar folds (stats swapped in, dict not) " +
      "double-counts nothing on the compactSidecars retry") {
    val store = tmp("r17-half")
    val idx = tmp("r17-half-idx")
    grow(store, idx, splits = 3)
    val latestBefore = serve(idx, docs)
    val (idxPath, fs) = fsOf(idx)
    // crash simulation: the exact production fold for stats only
    PostingsIngest.stampSidecarHorizon(fs, idxPath, 2L)
    PostingsIngest.foldSidecarTo(spark, idxPath, fs, "stats", 2L)
    assert(sidecarGens(idx, "stats") == Seq("gen=2") &&
      sidecarGens(idx, "dict").size == 3,
      "precondition: the half-folded window")
    // the retry: under r16's stamp-last ordering this reinstalled
    // per-gen stats rows NEXT TO the folded totals (their dirs read
    // as 'missing'), permanently doubling n/sumdl/df on the re-fold
    PostingsIngest.compactSidecars(spark, idx)
    assert(sidecarGens(idx, "dict") == Seq("gen=2") &&
      sidecarGens(idx, "stats") == Seq("gen=2"))
    val n = spark.read.parquet(
        PostingsIngest.sidecarRootPath(spark, idx, "stats"))
      .agg(sum("n")).head().getLong(0)
    assert(n == docs.count(),
      s"corpus doc count must survive the crash-retry exactly, got $n")
    assert(serve(idx, docs).sameElements(latestBefore),
      "scores must be bit-equal — any double-counted df/stats would move them")
    // and the whole store still round-trips against the one-shot oracle
    assert(latestBefore.sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
  }

  test("a takedown committed INTO the stamped-unfolded window keeps " +
      "zero-drift: tombstoneDocs heals the sidecars under its own lease " +
      "before committing") {
    val store = tmp("r17-tomb")
    val idx = tmp("r17-tomb-idx")
    grow(store, idx, splits = 3)
    val (idxPath, fs) = fsOf(idx)
    // crash simulation: horizon stamped, no fold ran, lease released
    PostingsIngest.stampSidecarHorizon(fs, idxPath, 2L)
    // a doc from src gen 0 (< horizon): its serve-time df correction
    // joins dict rows AT THE BUCKET key (gen=2), which exists only
    // after the fold — without the heal, the correction would be
    // silently dropped and idf would drift until the next maintenance
    val victim = serve(idx, docs)
      .map(_.getLong(1)).find(id => id >= Retrieval.NQueries && id % 3 == 0).get
    PostingsIngest.tombstoneDocs(Seq(victim).toDF("doc_id"), 0L, idx)
    assert(sidecarGens(idx, "dict") == Seq("gen=2"),
      "tombstoneDocs must finish the stamped compaction before committing")
    val alive = docs.filter(col("doc_id") =!= victim)
    assert(serve(idx, alive).sameElements(
      Retrieval.bm25TopK(alive).orderBy("q_id", "rank").collect()),
      "the takedown's df/stats corrections must land on the folded base")
  }

  test("stale fold recovery state from the r16-era sidecar rebase path " +
      "is settled by deletion, never swapped in") {
    val store = tmp("r17-stale")
    val idx = tmp("r17-stale-idx")
    grow(store, idx, splits = 2)
    val (idxPath, fs) = fsOf(idx)
    // an r16 compaction that crashed mid-swap: a COMPLETE-stamped
    // scratch (whose content is stale the moment anything else runs)
    // and the old root in the trash dir
    val scratch = new org.apache.hadoop.fs.Path(idxPath, ".rebase-scratch-stats")
    fs.mkdirs(scratch)
    graft.core.Markers.forceWrite(fs,
      new org.apache.hadoop.fs.Path(scratch, "_complete"), "0")
    fs.mkdirs(new org.apache.hadoop.fs.Path(idxPath, ".rebase-old-stats"))
    PostingsIngest.compactSidecars(spark, idx)
    assert(!fs.exists(scratch) &&
      !fs.exists(new org.apache.hadoop.fs.Path(idxPath, ".rebase-old-stats")),
      "sidecars are derived data — recovery dirs must be settled by deletion")
    assert(serve(idx, docs).sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
  }

  test("sidecar swaps publish whole-root versions with keep-two-back " +
      "retention: a reader that resolved its root before a maintenance " +
      "run survives BOTH swaps the run can perform") {
    val store = tmp("r17-ptr")
    val idx = tmp("r17-ptr-idx")
    // two thirds of the corpus in two batches; the last third and a
    // disjoint shifted copy arrive later (each doc_id in exactly one
    // batch — the store's ingest contract)
    for (b <- 0L until 2L) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b, store)
      PostingsIngest.consolidate(spark, store, idx)
    }
    val (idxPath, fs) = fsOf(idx)
    PostingsIngest.compactSidecars(spark, idx) // → stats-v1 / dict-v1
    assert(PostingsIngest.sidecarRootPath(spark, idx, "stats")
      .endsWith("stats-v1"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats")),
      "the pre-swap (legacy) root must survive for readers that " +
        "resolved it just before the publish")
    // grow one more gen, then build a probe plan that RESOLVES v1...
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), 2L, store)
    PostingsIngest.consolidate(spark, store, idx)
    val probe = IndexStore.bm25FromIndex(docs, spark, idx,
      Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
    // ...swap underneath it (v2), THEN run it: v1 is retained, so the
    // in-flight reader scans the complete pre-swap version — under the
    // r16 whole-root delete→rename this was a loud-failure window
    PostingsIngest.compactSidecars(spark, idx)
    assert(PostingsIngest.sidecarRootPath(spark, idx, "stats")
      .endsWith("stats-v2"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats-v1")) &&
      fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats")),
      "two versions back must survive: one maintenance run can swap a " +
        "root twice (reconcile rebuild + fold), and a reader that " +
        "resolved before the run must outlive both")
    val inFlight = probe.orderBy("q_id", "rank").collect()
    assert(inFlight.sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()),
      "the pre-swap version must serve the exact (identical) answer")
    // a third swap retires the legacy root — three behind (shifted
    // ids: disjoint from the corpus)
    PostingsIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")),
      3L, store)
    PostingsIngest.consolidate(spark, store, idx)
    PostingsIngest.compactSidecars(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats")) &&
      fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats-v1")) &&
      fs.exists(new org.apache.hadoop.fs.Path(idxPath, "stats-v2")))
  }

  test("maintain(sidecarKeepLast) bounds sidecar dirs across blind " +
      "cycles; as-of refuses only below the configured lag") {
    val store = tmp("r17-knob")
    val idx = tmp("r17-knob-idx")
    for (b <- 0L until 7L) {
      PostingsIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(7)) === b), b, store)
      PostingsIngest.maintain(spark, store, idx,
        rebaseAtGens = 3, sidecarKeepLast = Some(2))
      assert(sidecarGens(idx, "dict").size <= 3,
        s"cycle $b: dir count must stay bounded at keepLast + 1 base")
    }
    // horizon after 7 cycles with keepLast=2: gens [4,5,6] kept, base=4
    assert(PostingsIngest.sidecarHorizon(spark, idx) == 4L)
    assert(sidecarGens(idx, "dict") == Seq("gen=4", "gen=5", "gen=6"))
    // a snapshot INSIDE the lag serves exactly...
    val early = docs.filter(pmod(col("doc_id"), lit(7)) <= 5)
    assert(serve(idx, early, asOf = Some(5L)).sameElements(
      Retrieval.bm25TopK(early).orderBy("q_id", "rank").collect()),
      "as-of within the configured lag must keep serving after compaction")
    // ...at the horizon serves...
    val atH = docs.filter(pmod(col("doc_id"), lit(7)) <= 4)
    assert(serve(idx, atH, asOf = Some(4L)).sameElements(
      Retrieval.bm25TopK(atH).orderBy("q_id", "rank").collect()))
    // ...and below it refuses
    val e = intercept[IllegalArgumentException] {
      serve(idx, docs, asOf = Some(3L))
    }
    assert(e.getMessage.contains("compacted"), s"got: $e")
    // latest is exact after the whole regimen
    assert(serve(idx, docs).sameElements(
      Retrieval.bm25TopK(docs).orderBy("q_id", "rank").collect()))
  }

  test("the bloom prefilter probes through a codegen'd expression — " +
      "no UDF boundary in either gate path's plan, answers unchanged") {
    import graft.operators.{BloomPrune, TextAnalysis}
    // long keys: the join-prune path
    val dim = docs.filter(col("doc_id") < 20).select(col("doc_id").as("k"))
    val fact = docs.select("doc_id", "text")
    val pruned = BloomPrune.bloomSemiJoin(fact, "doc_id", dim, "k",
      expectedKeys = 1000L, fpp = 0.03).orderBy("doc_id")
    val exact = fact.join(
      broadcast(dim.select(col("k").as("doc_id"))), Seq("doc_id"), "left_semi")
    assert(pruned.collect()
      .sameElements(exact.orderBy("doc_id").collect()),
      "bloom prefilter + exact semi-join must equal the plain semi-join")
    // plan asserts on the FINAL (post-AQE, post-action) physical plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("UDF"),
      s"the per-row scala-UDF boundary must be gone:\n$plan")
    // the probe filter runs INSIDE whole-stage codegen (the '*' span)
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("bloom_might_contain") &&
        l.trim.stripPrefix(":- ").stripPrefix("+- ").startsWith("*")),
      s"the probe must sit inside a WholeStageCodegen span:\n$plan")
    // ...and the display elides the serialized sketch (megabytes of
    // hex at real key counts would bloat every explain/UI string)
    assert(plan.contains("<bloom:"), plan)
    // string keys: the n-gram decontamination path shares one oracle
    // with its exact twin — identity IS the contract
    val bloomed = TextAnalysis.textContaminationBloom(spark, dir)
    assert(bloomed.collect().sameElements(
      TextAnalysis.textContamination(spark, dir).collect()))
    val planB = bloomed.queryExecution.executedPlan.toString
    assert(planB.contains("bloom_might_contain") && !planB.contains("UDF"),
      planB)
  }

  test("format guards: legacy unsuffixed recovery dirs refuse; a gen " +
      "forest without src_gen refuses with a rebuild message") {
    val store = tmp("r17-fmt")
    val idx = tmp("r17-fmt-idx")
    grow(store, idx, splits = 2)
    val (idxPath, fs) = fsOf(idx)
    // a pre-r16 revision's crashed rebase left unsuffixed dirs: this
    // revision cannot tell which forest they belong to — refuse
    fs.mkdirs(new org.apache.hadoop.fs.Path(idxPath, ".rebase-scratch"))
    val e1 = intercept[IllegalArgumentException] {
      PostingsIngest.rebase(spark, idx)
    }
    assert(e1.getMessage.contains("older revision"), s"got: $e1")
    fs.delete(new org.apache.hadoop.fs.Path(idxPath, ".rebase-scratch"), true)
    PostingsIngest.rebase(spark, idx) // and settles cleanly without it
    // an index whose forest predates the src_gen row column must fail
    // with the rebuild message, not an opaque unresolved-column error
    val legacyRows = spark.read.parquet(s"$idx/postings").drop("src_gen")
    val scratch = tmp("r17-fmt-legacy")
    legacyRows.write.mode("overwrite").partitionBy("gen", "pb")
      .parquet(s"$scratch/postings")
    fs.delete(new org.apache.hadoop.fs.Path(idxPath, "postings"), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/postings"),
      new org.apache.hadoop.fs.Path(idxPath, "postings")))
    val e2 = intercept[IllegalArgumentException] {
      serve(idx, docs)
    }
    assert(e2.getMessage.contains("src_gen") &&
      e2.getMessage.contains("rebuild"), s"got: $e2")
  }
}
