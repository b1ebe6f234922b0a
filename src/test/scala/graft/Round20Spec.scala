package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval}
import graft.streaming.{PostingsIngest, TombstoneStore}

/** Round-20 invariants — the operational edges the r19 soaks exposed,
  * promoted from runbook notes to enforced contracts:
  *
  *   1. BOUNDED-RETRY TAKEDOWN INGESTION (VERDICT r19 #2): a takedown
  *      issued while a maintenance window is open lands WITHOUT
  *      caller-side retry code — `writeGuarded`/`tombstoneDocs` poll
  *      the lease within a bounded budget, then fail with the same
  *      loud runbook message. The lease discipline is unchanged:
  *      every attempt is a fresh atomic tryCreate.
  *   2. SHARDED SNAPSHOT WRITE (VERDICT r19 #3): a fold whose source
  *      bytes exceed the shard threshold writes a multi-file snapshot
  *      version (no more O(snapshot) single-task rewrite after a bulk
  *      purge) while the version-dir + `_covers` + atomic-rename
  *      discipline — and every read — is unchanged.
  *   3. AMORTIZED PURGE TRIGGER (VERDICT r19 #4): `purgeAtBatches = k`
  *      defers the O(live forest) purging rebase until k tombstone
  *      batches are unpurged. Serve-side hiding and score corrections
  *      stay IMMEDIATE and bit-exact at every intermediate cycle; the
  *      tombstone dir tail widens by at most k.
  */
class Round20Spec extends SparkSpec {
  import spark.implicits._

  private val fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def dirCount(path: String, prefix: String): Int = {
    val p = new Path(path)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith(prefix))
  }

  private def mkDocs(nDocs: Long) = spark.range(nDocs).select(
    col("id").as("doc_id"),
    expr("concat_ws(' ', transform(sequence(0, 39), " +
      "i -> concat('w', pmod(id * 31 + i * 17, 2000))))").as("text"))

  private def readIds(idx: String): Set[Long] =
    TombstoneStore.read(spark, idx, "doc_id")
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)

  // ---- 1. bounded-retry takedown ingestion -------------------------------

  test("a takedown issued mid-maintenance lands without caller-side " +
      "retry: writeGuarded polls the lease within maxWaitMs; the " +
      "zero-budget path still refuses loudly") {
    val idx = tmp("r20-retry") + "/idx"
    TombstoneStore.writeGuarded(Seq(1L).toDF("doc_id"), 0L, idx)
    val claim = new Path(idx, "_consolidate_commit")
    // simulate a live maintenance window that closes after ~400 ms
    graft.core.Markers.forceWrite(fs, claim, "live-fold\ntombstone-fold 9")
    val releaser = new Thread(() => {
      Thread.sleep(400)
      fs.delete(claim, false)
    })
    releaser.start()
    try {
      // zero budget: one attempt, refused while the lease is held
      val e = intercept[IllegalStateException] {
        TombstoneStore.writeGuarded(Seq(7L).toDF("doc_id"), 1L, idx)
      }
      assert(e.getMessage.contains("retry once the lease clears"))
      assert(e.getMessage.contains("delete"),
        "the refusal must carry the dead-claimer recovery runbook")
      // bounded budget: the SAME call shape lands once the window
      // closes — no retry loop at the call site
      TombstoneStore.writeGuarded(Seq(7L).toDF("doc_id"), 1L, idx,
        maxWaitMs = 15000L)
    } finally releaser.join()
    assert(readIds(idx) == Set(1L, 7L))
    // the lease was released by the write itself
    assert(!fs.exists(claim))
  }

  test("PostingsIngest.tombstoneDocs waits out a maintenance window " +
      "under the same bounded budget, then records dl/gen as usual") {
    val base = tmp("r20-pretry")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val docs = mkDocs(300L)
    PostingsIngest.ingestBatch(docs, 0L, store)
    PostingsIngest.consolidate(spark, store, idx)
    val claim = new Path(idx, "_consolidate_commit")
    graft.core.Markers.forceWrite(fs, claim, "live-run\nconsolidate 9")
    val releaser = new Thread(() => {
      Thread.sleep(400)
      fs.delete(claim, false)
    })
    releaser.start()
    try {
      PostingsIngest.tombstoneDocs(Seq(42L).toDF("doc_id"), 1L, idx,
        maxWaitMs = 15000L)
    } finally releaser.join()
    // the landed batch carries the forest-recorded dl (not null): the
    // retry path went through the full guard + dl lookup
    val row = spark.read.parquet(s"$idx/tombstones")
      .filter(col("doc_id") === 42L).select("dl").as[Long].collect()
    assert(row.length == 1 && row.head > 0L,
      "the retried takedown must record its dl correction")
    // and serving reflects it immediately
    val alive = docs.filter(col("doc_id") =!= 42L)
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == oneShot)
  }

  // ---- 2. sharded snapshot write -----------------------------------------

  test("SET-mode fold shards the snapshot above the byte threshold: " +
      "multi-file version, reads exact, _covers discipline and the next " +
      "fold unchanged") {
    val idx = tmp("r20-shard") + "/idx"
    TombstoneStore.writeGuarded(
      spark.range(0, 500).select(col("id").as("doc_id")), 0L, idx)
    TombstoneStore.writeGuarded(
      spark.range(400, 900).select(col("id").as("doc_id")), 1L, idx)
    graft.core.Markers.forceWrite(fs, new Path(idx, "_purged"), "1")
    // tiny threshold: the two source dirs' bytes force a multi-file
    // snapshot (the bulk-purge shape, scaled down)
    TombstoneStore.fold(spark, idx, purged = 1L, "doc_id",
      shardBytes = 2048L)
    assert(TombstoneStore.coveredThrough(spark, idx) == 1L)
    val v0 = new Path(idx, "tombstones_snapshot/v=0")
    val parts = fs.listStatus(v0).map(_.getPath.getName)
      .count(n => n.startsWith("part-") && n.endsWith(".parquet"))
    assert(parts > 1, s"expected a sharded snapshot, got $parts part file(s)")
    assert(graft.core.Markers.read(fs, new Path(v0, "_covers")).contains("1"))
    assert(readIds(idx) == (0L until 900L).toSet)
    // a later fold READS the sharded snapshot as its base and stays
    // exact (single-file this time: below the default threshold)
    TombstoneStore.writeGuarded(
      spark.range(900, 905).select(col("id").as("doc_id")), 2L, idx)
    graft.core.Markers.forceWrite(fs, new Path(idx, "_purged"), "2")
    TombstoneStore.fold(spark, idx, purged = 2L, "doc_id")
    assert(TombstoneStore.coveredThrough(spark, idx) == 2L)
    assert(readIds(idx) == (0L until 905L).toSet)
  }

  test("ROW-mode fold shards too, preserving the correction row-set and " +
      "batch_id column across the multi-file snapshot") {
    val idx = tmp("r20-shardrow") + "/idx"
    def sinkRows(lo: Long, hi: Long, b: Long): Unit =
      graft.streaming.EventStreams.idempotentParquetSink(s"$idx/tombstones")(
        spark.range(lo, hi).select(col("id").as("doc_id"),
          (col("id") % 7 + 10).as("dl"), lit(0L).as("gen")), b)
    sinkRows(0, 400, 0L)
    sinkRows(400, 800, 1L)
    graft.core.Markers.forceWrite(fs, new Path(idx, "_purged"), "1")
    TombstoneStore.foldRows(spark, idx, purged = 1L, shardBytes = 2048L)
    val v0 = new Path(idx, "tombstones_snapshot/v=0")
    val parts = fs.listStatus(v0).map(_.getPath.getName)
      .count(n => n.startsWith("part-") && n.endsWith(".parquet"))
    assert(parts > 1, s"expected a sharded row snapshot, got $parts")
    val rows = TombstoneStore.readRows(spark, idx).get
      .select("doc_id", "dl", "gen", "batch_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = (0L until 800L).map(i =>
      (i, i % 7 + 10, 0L, if (i < 400) 0L else 1L)).toSet
    assert(rows == expected,
      "the sharded row snapshot must preserve every correction row")
  }

  // ---- 3. amortized purge trigger ----------------------------------------

  test("purgeAtBatches defers the purging rebase until k batches are " +
      "unpurged; serving stays bit-exact at every intermediate cycle and " +
      "the dir tail is bounded by k + the deferred intake") {
    val base = tmp("r20-amort")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val nDocs = 1200L
    val cycles = 8
    val perB = nDocs / cycles
    val docs = mkDocs(nDocs)
    val purgeAt = 3
    val dead = scala.collection.mutable.Set.empty[Long]
    def purgedStamp: Long = graft.core.Markers.read(fs,
      new Path(idx, "_purged")).map(_.toLong).getOrElse(-1L)
    var purges = 0
    var lastStamp = -1L
    for (c <- 0 until cycles) {
      PostingsIngest.ingestBatch(
        docs.filter(col("doc_id") >= c * perB && col("doc_id") < (c + 1) * perB),
        c.toLong, store)
      if (c > 0) {
        PostingsIngest.tombstoneDocs(
          Seq((c * perB - 2)).toDF("doc_id"), c.toLong, idx)
        dead += c * perB - 2
      }
      // rebaseAtGens high enough that ONLY the tombstone trigger can
      // fire a rebase in this loop
      PostingsIngest.maintain(spark, store, idx,
        rebaseAtGens = 20, purgeAtBatches = purgeAt)
      val stamp = purgedStamp
      if (stamp > lastStamp) { purges += 1; lastStamp = stamp }
      // fewer than purgeAt unpurged batches must NOT advance the purge
      // stamp — the deferral is the whole point; when it does advance,
      // it covers everything landed so far. Takedowns land at cycles
      // 1..7 with batch id c, so the trigger fires exactly at c=3
      // (batches 1,2,3 unpurged) and c=6 (4,5,6)
      val expectedStamp = if (c < 3) -1L else if (c < 6) 3L else 6L
      assert(stamp == expectedStamp,
        s"cycle $c: purge stamp $stamp, expected $expectedStamp")
      // post-maintain bound = 2*purgeAt - 1: one fold's purgeAt-dir
      // intake retired one fold late + up to purgeAt-1 fresh batches
      // waiting for the next amortized purge
      assert(dirCount(s"$idx/tombstones", "batch_id=") <= 2 * purgeAt - 1,
        s"cycle $c: unpurged tail must stay bounded by purgeAtBatches")
      assert(dirCount(s"$idx/tombstones_snapshot", "v=") <= 2)
      // serve-side hiding + corrections are purge-independent: exact
      // with unpurged batches pending (c=2: two unpurged, no snapshot;
      // c=5: folded {1,2,3} + unpurged {4,5}, the mixed shape; c=7:
      // two snapshot versions + a fresh tail batch)
      if (c == 2 || c == 5 || c == 7) {
        val ingested = docs.filter(col("doc_id") < (c + 1) * perB)
        val alive = ingested.filter(
          !col("doc_id").isin(dead.toSeq.map(Long.box): _*))
        val served = IndexStore.bm25FromIndex(alive, spark, idx,
            Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
          .orderBy("q_id", "rank").collect().toSeq
        val oneShot = Retrieval.bm25TopK(alive)
          .orderBy("q_id", "rank").collect().toSeq
        assert(served == oneShot,
          s"cycle $c: serving must be exact with unpurged batches pending")
      }
    }
    // 7 takedowns at k=3 → exactly 2 purging rebases fired (cycles 3
    // and 6: the trigger counts unpurged batches, not cycles)
    assert(purges == 2, s"expected 2 amortized purges, got $purges")
    // every takedown ever landed still served (folded or tail)
    assert(readIds(idx) == dead.toSet)
    // horizon exact
    val alive = docs.filter(!col("doc_id").isin(dead.toSeq.map(Long.box): _*))
    val served = IndexStore.bm25FromIndex(alive, spark, idx,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Retrieval.bm25TopK(alive)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == oneShot)
  }

  test("purgeAtBatches is shared by all three grown stores: the ANN and " +
      "band maintains defer the purge the same way, with serve exact " +
      "while batches wait") {
    import graft.streaming.{AnnIngest, DedupIngest}
    def purgedOf(idx: String): Long = graft.core.Markers.read(fs,
      new Path(idx, "_purged")).map(_.toLong).getOrElse(-1L)
    // ---- ANN ----
    val abase = tmp("r20-annamort")
    val astore = s"$abase/store"
    val aidx = s"$abase/idx"
    val dim = 8
    val vecs = spark.range(24).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "i -> cast(sin(id * 13 + i * 7) as float))").as("embedding"))
    AnnIngest.ingestBatch(vecs, 0L, astore)
    AnnIngest.maintain(spark, astore, aidx, purgeAtBatches = 2)
    AnnIngest.tombstone(Seq(3L).toDF("vec_id"), 1L, aidx)
    AnnIngest.maintain(spark, astore, aidx, purgeAtBatches = 2)
    assert(purgedOf(aidx) == -1L, "one unpurged ANN batch must not rebase")
    // hidden at serve while physically present (purge deferred)
    assert(AnnIngest.searchGrown(vecs, spark, aidx, nQueries = 3, k = 4)
      .filter(col("neighbor_id") === 3L).isEmpty)
    assert(spark.read.parquet(s"$aidx/index")
      .filter(col("vec_id") === 3L).count() == 1L,
      "the deferred purge must leave the row physically present")
    AnnIngest.tombstone(Seq(7L).toDF("vec_id"), 2L, aidx)
    AnnIngest.maintain(spark, astore, aidx, purgeAtBatches = 2)
    assert(purgedOf(aidx) == 2L, "two unpurged ANN batches must rebase")
    assert(spark.read.parquet(s"$aidx/index")
      .filter(col("vec_id").isin(3L, 7L)).isEmpty,
      "the amortized purge must physically delete both batches")
    // ---- band ----
    val bbase = tmp("r20-bandamort")
    val bstore = s"$bbase/store"
    val bidx = s"$bbase/idx"
    val docs = spark.range(30).select(
      col("id").as("doc_id"),
      expr("concat_ws(' ', transform(sequence(0, 11), " +
        "i -> concat('w', pmod(id * 7 + i * 5, 40))))").as("text"))
    DedupIngest.ingestBatch(docs, 0L, bstore)
    DedupIngest.maintain(spark, bstore, bidx, purgeAtBatches = 2)
    DedupIngest.tombstoneDocs(Seq(5L).toDF("doc_id"), 1L, bidx)
    DedupIngest.maintain(spark, bstore, bidx, purgeAtBatches = 2)
    assert(purgedOf(bidx) == -1L, "one unpurged band batch must not rebase")
    assert(spark.read.parquet(s"$bidx/bands")
      .filter(col("doc_id") === 5L).count() > 0L)
    DedupIngest.tombstoneDocs(Seq(6L).toDF("doc_id"), 2L, bidx)
    DedupIngest.maintain(spark, bstore, bidx, purgeAtBatches = 2)
    assert(purgedOf(bidx) == 2L, "two unpurged band batches must rebase")
    assert(spark.read.parquet(s"$bidx/bands")
      .filter(col("doc_id").isin(5L, 6L)).isEmpty)
    val e = intercept[IllegalArgumentException] {
      AnnIngest.maintain(spark, astore, aidx, purgeAtBatches = 0)
    }
    assert(e.getMessage.contains("purgeAtBatches"))
  }

  test("purgeAtBatches = 1 is today's behavior (any unpurged batch " +
      "rebases); 0 is refused") {
    val base = tmp("r20-amort1")
    val store = s"$base/store"
    val idx = s"$base/idx"
    val docs = mkDocs(300L)
    PostingsIngest.ingestBatch(docs, 0L, store)
    PostingsIngest.maintain(spark, store, idx)
    PostingsIngest.tombstoneDocs(Seq(5L).toDF("doc_id"), 1L, idx)
    PostingsIngest.maintain(spark, store, idx) // default purgeAtBatches = 1
    assert(graft.core.Markers.read(fs, new Path(idx, "_purged"))
      .map(_.toLong).contains(1L),
      "one unpurged batch must trigger the rebase at the default")
    val e = intercept[IllegalArgumentException] {
      PostingsIngest.maintain(spark, store, idx, purgeAtBatches = 0)
    }
    assert(e.getMessage.contains("purgeAtBatches"))
  }
}
