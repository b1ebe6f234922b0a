package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval}
import graft.streaming.{PostingsIngest, TombstoneStore}

/** Round-19 invariants: the POSTINGS store's tombstone forest is now
  * bounded (closing the r18 "last unbounded dir count" adjudication)
  * by the row-preserving snapshot fold — and the fold is invisible to
  * the store's exact-scoring contract.
  *
  *   1. A takedown-heavy blind-timer loop (a takedown EVERY cycle —
  *      the deployment shape the r18 adjudication said would "feel
  *      the listing bill") keeps the tombstone dir count flat: after
  *      each maintain, the forest is the unfolded tail plus at most
  *      two snapshot versions, regardless of how many takedowns ever
  *      landed. Serving at the horizon is still bit-equal to the
  *      one-shot BM25 over survivors.
  *   2. The fold preserves `batch_id`/`dl`/`gen` as data, so LIVE
  *      serve-time corrections (a fresh takedown admitted after folds
  *      retired the old batches, before any purge) still compose to
  *      the exact one-shot answer — the correction rows the fold
  *      moved into the snapshot contribute exactly nothing, the fresh
  *      batch exactly its recorded dl/df.
  *   3. A settle-only maintain (no new takedowns) changes no serve
  *      result — fold idempotence at the serving surface, including
  *      under as-of.
  *   4. The ingest-side guard refuses a takedown batch id at or below
  *      the purge stamp (it would fold without ever being physically
  *      purged — the r18 ADVICE window), naming the floor.
  */
class Round19Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def dirCount(path: String, prefix: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith(prefix))
  }

  private def mkDocs(nDocs: Long) = spark.range(nDocs).select(
    col("id").as("doc_id"),
    expr("concat_ws(' ', transform(sequence(0, 39), " +
      "i -> concat('w', pmod(id * 31 + i * 17, 2000))))").as("text"))

  test("takedown-heavy blind-timer loop: postings tombstone dirs stay " +
      "FLAT (unfolded tail + <=2 snapshot versions), serve exact at the " +
      "horizon") {
    val base = tmp("r19-heavy")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val nDocs = 2000L
    val cycles = 16
    val perB = nDocs / cycles
    val docs = mkDocs(nDocs)
    for (c <- 0 until cycles) {
      PostingsIngest.ingestBatch(
        docs.filter(col("doc_id") >= c * perB && col("doc_id") < (c + 1) * perB),
        c.toLong, store)
      // a takedown EVERY cycle — the r18 adjudication's worst case
      if (c > 0)
        PostingsIngest.tombstoneDocs(
          Seq((c * perB - 2).toLong).toDF("doc_id"), c.toLong, idx)
      PostingsIngest.maintain(spark, store, idx,
        rebaseAtGens = 6, sidecarKeepLast = Some(2))
      // the bound the r18 board couldn't claim: after maintain, every
      // takedown at or below the purge stamp is folded, and deferred
      // deletion keeps at most the LAST fold's intake as covered
      // debt — dir count is flat in c, not linear
      assert(dirCount(s"$idx/tombstones", "batch_id=") <= 2,
        s"cycle $c: tombstone dirs not bounded by the snapshot fold")
      assert(dirCount(s"$idx/tombstones_snapshot", "v=") <= 2,
        s"cycle $c: snapshot retention must keep at most two versions")
    }
    val tombs = TombstoneStore.readRows(spark, idx)
      .get.select("doc_id").distinct()
    assert(tombs.count() == cycles - 1,
      "every takedown ever landed must still be served from the snapshot")
    val alive = docs.join(broadcast(tombs), Seq("doc_id"), "left_anti")
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == oneShot,
      "the takedown-heavy horizon must serve the one-shot answer")
  }

  test("LIVE corrections across a fold: a fresh takedown after the old " +
      "batches folded still composes to the exact one-shot answer, " +
      "before any purge reflects it") {
    val base = tmp("r19-live")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val nDocs = 1200L
    val docs = mkDocs(nDocs)
    for (c <- 0 until 4) {
      PostingsIngest.ingestBatch(
        docs.filter(col("doc_id") >= c * 300L && col("doc_id") < (c + 1) * 300L),
        c.toLong, store)
      PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 2)
    }
    // two old takedowns, purged and FOLDED by maintain
    PostingsIngest.tombstoneDocs(Seq(100L, 400L).toDF("doc_id"), 10L, idx)
    PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 2)
    assert(TombstoneStore.coveredThrough(spark, idx) == 10L,
      "the old takedown batch must be folded into the snapshot")
    // a FRESH takedown lands after the fold; no maintain afterwards —
    // serving must hide it via the anti-join and correct df/stats via
    // its recorded dl rows, while the folded batch contributes no
    // correction (its tb <= every sidecar cutoff)
    PostingsIngest.tombstoneDocs(Seq(700L).toDF("doc_id"), 11L, idx)
    val alive = docs.filter(!col("doc_id").isin(100L, 400L, 700L))
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == oneShot,
      "live correction over a folded forest must equal the one-shot")
  }

  test("a settle-only maintain changes no serve result, latest or as-of " +
      "— the fold is idempotent at the serving surface") {
    val base = tmp("r19-idem")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val nDocs = 900L
    val docs = mkDocs(nDocs)
    for (c <- 0 until 3) {
      PostingsIngest.ingestBatch(
        docs.filter(col("doc_id") >= c * 300L && col("doc_id") < (c + 1) * 300L),
        c.toLong, store)
      PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 8)
    }
    PostingsIngest.tombstoneDocs(Seq(50L, 350L).toDF("doc_id"), 5L, idx)
    PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 8)
    val wm = PostingsIngest.consolidatedThrough(spark, idx).get
    val alive = docs.filter(!col("doc_id").isin(50L, 350L))
    def serve(asOf: Option[Long]) =
      IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K, asOfGen = asOf)
        .orderBy("q_id", "rank").collect().toSeq
    val (latest0, asOf0) = (serve(None), serve(Some(wm)))
    // settle-only cycles: nothing new to fold; the serve surface and
    // the takedown set must be byte-stable
    PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 8)
    PostingsIngest.maintain(spark, store, idx, rebaseAtGens = 8)
    assert(serve(None) == latest0, "latest serve drifted across settle-only folds")
    assert(serve(Some(wm)) == asOf0, "as-of serve drifted across settle-only folds")
    assert(TombstoneStore.readRows(spark, idx).get
      .select("doc_id").distinct().as[Long].collect().toSet == Set(50L, 350L))
  }

  test("the postings ingest guard refuses a takedown batch id at or " +
      "below the purge stamp, naming the floor") {
    val base = tmp("r19-guard")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val docs = mkDocs(300L)
    PostingsIngest.ingestBatch(docs, 0L, store)
    PostingsIngest.maintain(spark, store, idx)
    PostingsIngest.tombstoneDocs(Seq(10L).toDF("doc_id"), 3L, idx)
    PostingsIngest.maintain(spark, store, idx) // purges through 3, folds
    val e = intercept[IllegalArgumentException] {
      PostingsIngest.tombstoneDocs(Seq(20L).toDF("doc_id"), 2L, idx)
    }
    assert(e.getMessage.contains("fresh"))
    assert(e.getMessage.contains("purge stamp"))
    // the refused write landed nothing; a fresh id is admitted and
    // corrects exactly
    PostingsIngest.tombstoneDocs(Seq(20L).toDF("doc_id"), 4L, idx)
    val alive = docs.filter(!col("doc_id").isin(10L, 20L))
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == oneShot)
  }
}
