package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared major-compaction skeleton for `gen=` generation forests —
  * the claim/build/swap/two-way-recovery discipline that
  * [[PostingsIngest.rebase]] proved out, extracted so the postings
  * forest (pb-partitioned), the ANN codes forest (cell-partitioned,
  * [[AnnIngest.rebase]]) and the dedup band forest run the SAME
  * hardened path instead of hand copies. Only the fold transform and
  * partition layout differ per store; every crash-window branch is
  * common.
  *
  * Contract: fold EVERY generation under `indexPath/forestName` into
  * one base gen keyed by `max(wm, max gen id on disk)` — the caller
  * supplies its stamped consolidation watermark, but a consolidation
  * that crashed after its gen rename and before its watermark write
  * legitimately leaves a generation NEWER than the watermark, and
  * folding that gen under the watermark's id would make the next
  * consolidate (whose floor is max(watermark, maxGen) = watermark)
  * re-fold the batches it covers, silently duplicating rows. Keying
  * the fold at the max closes that window: the next consolidate's
  * floor lands exactly on the fold id. The swap replaces the whole
  * forest in two renames (old → trash, scratch → live); a crash
  * anywhere is settled by re-running — the recovery prologue rolls a
  * stamped scratch FORWARD and an unstamped one BACK before any new
  * work. Callers must refuse to consolidate while the recovery dirs
  * exist (all ingest modules do), or a fresh gen could recreate the
  * root and strand the real forest in the trash dir. */
object GenForest {

  private val GenDir = "gen=(\\d+)".r

  /** On-disk format guard, shared by every rebase/consolidate entry:
    * recovery dirs gained a -<forest> suffix in r16 — unsuffixed dirs
    * mean a rebase from a PRE-suffix revision crashed mid-swap here,
    * and this revision cannot tell which forest the recovery state
    * belongs to; proceeding could recreate the root and silently
    * strand the real forest in the old trash. */
  private[graft] def requireNoLegacyRecoveryDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      idx: org.apache.hadoop.fs.Path): Unit =
    require(!fs.exists(new org.apache.hadoop.fs.Path(idx, ".rebase-scratch")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(idx, ".rebase-old")),
      s"index at $idx carries rebase recovery state from an " +
        "older revision (unsuffixed .rebase-scratch/.rebase-old) — " +
        "finish that rebase with the revision that started it, or if " +
        "the live forest is intact, delete the legacy dirs first")

  private[streaming] def numberedDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      pat: scala.util.matching.Regex): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { s =>
      s.getPath.getName match {
        case pat(id) if s.isDirectory => Some(id.toLong -> s.getPath)
        case _                        => None
      }
    }

  /** True iff `dir` holds at least one real data file (recursively,
    * skipping `_`/`.`-prefixed bookkeeping). A consolidation whose
    * rows were ALL filtered away (e.g. a batch containing only
    * tombstoned ids) still writes a dir with a `_SUCCESS` marker and
    * nothing else — installing it as a generation would later blow up
    * every whole-forest read with UNABLE_TO_INFER_SCHEMA, so builders
    * check this and skip the install instead. */
  private[graft] def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists { s =>
      val n = s.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) false
      else if (s.isDirectory) hasDataFiles(fs, s.getPath)
      else true
    }

  // ---- per-generation source metadata ---------------------------------

  /** Each forest gen dir may carry a `_gens` marker: one line per
    * SOURCE generation folded into it — "srcGen cutoff", where cutoff
    * is the tombstone-batch watermark whose takedowns are REFLECTED
    * (absent) in that source generation's rows (-1 = none were). A
    * fresh consolidation writes one line for itself; a rebase fold
    * writes the union of its inputs' maps, so source-generation
    * identity (and thus as-of serving and per-src-gen sidecars)
    * survives physical compaction. Dirs without the marker read as
    * the singleton {dirGen -> -1}. */
  private[graft] def readGensMarker(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path, dirGen: Long): Map[Long, Long] =
    graft.core.Markers.read(fs,
        new org.apache.hadoop.fs.Path(genDir, "_gens")) match {
      case None => Map(dirGen -> -1L)
      case Some(s) => s.linesIterator.map { line =>
        val parts = line.trim.split("\\s+")
        parts(0).toLong -> parts(1).toLong
      }.toMap
    }

  private[graft] def writeGensMarker(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path, m: Map[Long, Long]): Unit =
    graft.core.Markers.forceWrite(fs,
      new org.apache.hadoop.fs.Path(genDir, "_gens"),
      m.toSeq.sorted.map { case (g, c) => s"$g $c" }.mkString("\n"))

  /** Union of the forest's per-dir source maps: srcGen → cutoff. */
  private[graft] def srcGens(fs: org.apache.hadoop.fs.FileSystem,
      genRoot: org.apache.hadoop.fs.Path): Map[Long, Long] =
    numberedDirs(fs, genRoot, GenDir).flatMap { case (g, p) =>
      readGensMarker(fs, p, g)
    }.toMap

  /** `fold` receives the whole-forest frame (with `gen` and the
    * layout's partition columns as readback columns) and returns the
    * frame to lay out as the single base generation; it must drop
    * `gen` itself (and re-derive any hashed partition key with the
    * store's stamped parameters). Row-level source identity is the
    * STORE's concern: forests that serve as-of reads carry a
    * `src_gen` data column their fold must preserve.
    *
    * `forceFold`: fold even a single-generation forest. The default
    * skips that case (a pure layout fold of one gen is a no-op), but
    * a LOSSY fold — one whose `fold` drops rows, e.g. a tombstone
    * purge — must run regardless of generation count, or a
    * single-gen index would silently never purge.
    *
    * `foldCutoff`: a purging fold reflects every tombstone batch up
    * to this watermark in EVERY source generation's surviving rows —
    * the folded dir's `_gens` marker records it as each src gen's new
    * cutoff. None (pure layout fold) carries the inputs' cutoffs
    * through unchanged.
    *
    * `invalidate`: called once a fold is COMMITTED to (after the
    * early-return checks, before the build), for callers that keep
    * per-generation sidecar artifacts the fold is about to make stale.
    * Idempotent on every crash window: before the `done` stamp a retry
    * re-invokes it; after the stamp the first attempt already ran it;
    * and a caller's post-rebase reconcile rebuilds whatever is missing
    * from the settled forest. */
  /** `claimHeld`: the caller already owns the index's
    * `_consolidate_commit` lease (e.g. it is folding several forests
    * under one mutual-exclusion window) — skip acquiring/releasing it
    * here. The recovery prologue and every crash branch still run. */
  /** `schema`: the forest's declared read schema (data + readback
    * partition columns) — skips the whole-forest schema-inference job
    * a bare read runs; None keeps inference for stores that have not
    * declared one. */
  def rebase(spark: SparkSession, indexPath: String, forestName: String,
      wm: Long, partitionCols: Seq[String],
      forceFold: Boolean = false,
      foldCutoff: Option[Long] = None,
      invalidate: () => Unit = () => (),
      claimHeld: Boolean = false,
      schema: Option[org.apache.spark.sql.types.StructType] = None)(
      fold: DataFrame => DataFrame): Unit = {
    val idx = new org.apache.hadoop.fs.Path(indexPath)
    val fs = idx.getFileSystem(spark.sessionState.newHadoopConf())
    requireNoLegacyRecoveryDirs(fs, idx)
    val genRoot = new org.apache.hadoop.fs.Path(idx, forestName)
    val scratch = new org.apache.hadoop.fs.Path(idx, s".rebase-scratch-$forestName")
    val trash = new org.apache.hadoop.fs.Path(idx, s".rebase-old-$forestName")
    val done = new org.apache.hadoop.fs.Path(scratch, "_complete")
    val runId = java.util.UUID.randomUUID().toString
    val claim = new org.apache.hadoop.fs.Path(idx, "_consolidate_commit")
    if (!claimHeld &&
        !graft.core.Markers.tryCreate(fs, claim, s"$runId\nrebase $wm"))
      throw new IllegalStateException(
        s"index $indexPath already has a consolidation/rebase in flight " +
          s"(or a dead one's marker at $claim)")
    try {
      // RECOVER a crashed swap before anything else: the forest can be
      // mid-flight between trash and scratch. Forward when the scratch
      // carries its completeness stamp, back (restore trash) otherwise.
      if (!fs.exists(genRoot)) {
        if (fs.exists(scratch) && graft.core.Markers.read(fs, done).nonEmpty)
          require(fs.rename(scratch, genRoot),
            s"failed to roll a crashed rebase forward at $genRoot")
        else if (fs.exists(trash)) {
          require(fs.rename(trash, genRoot),
            s"failed to roll a crashed rebase back at $genRoot")
          if (fs.exists(scratch)) fs.delete(scratch, true)
        } else throw new IllegalStateException(
          s"forest missing at $genRoot with no rebase recovery " +
            "state — the index is damaged beyond what rebase can repair")
      }
      fs.delete(trash, true) // forest is live; any trash is settled debt
      fs.delete(new org.apache.hadoop.fs.Path(genRoot, "_complete"), false)
      val gens = numberedDirs(fs, genRoot, GenDir)
      if (gens.isEmpty) return
      if (gens.size == 1 && !forceFold) return // already one generation
      // fold key: max(watermark, max gen on disk) — see the object doc
      val foldId = math.max(wm, gens.map(_._1).max)
      // source metadata captured from the LIVE dirs before anything
      // moves; a purging fold advances every src gen's cutoff
      val srcMap0 = gens.flatMap { case (g, p) => readGensMarker(fs, p, g) }.toMap
      val srcMap = foldCutoff match {
        case Some(c) => srcMap0.map { case (g, old) => g -> math.max(old, c) }
        case None    => srcMap0
      }
      invalidate()
      // BUILD: one partitioned copy of the whole forest under
      // scratch/gen=<foldId>, completeness proven by the stamp write
      if (graft.core.Markers.read(fs, done).isEmpty) {
        if (fs.exists(scratch)) fs.delete(scratch, true)
        val genOut = new org.apache.hadoop.fs.Path(scratch, s"gen=$foldId")
        val reader = schema.foldLeft(spark.read)((r, s) => r.schema(s))
        fold(reader.parquet(genRoot.toString))
          .write.mode("errorifexists").partitionBy(partitionCols: _*)
          .parquet(genOut.toString)
        // a lossy fold can empty the WHOLE forest (total takedown):
        // swap in an empty root — zero generations, the same state as
        // a consolidated-but-all-idle index — rather than a gen dir
        // holding only markers, which breaks every whole-forest read
        if (!hasDataFiles(fs, genOut)) {
          fs.delete(genOut, true)
          fs.mkdirs(scratch)
        } else writeGensMarker(fs, genOut, srcMap)
        graft.core.Markers.forceWrite(fs, done, foldId.toString)
      }
      // SWAP: forest → trash, scratch → forest, settle. Any crash in
      // here lands in one of the recovery branches above.
      require(fs.rename(genRoot, trash), s"failed to retire $genRoot")
      require(fs.rename(scratch, genRoot),
        s"failed to install rebased forest at $genRoot")
      fs.delete(new org.apache.hadoop.fs.Path(genRoot, "_complete"), false)
      fs.delete(trash, true)
    } finally {
      // a caller-held lease is the CALLER's to release — deleting it
      // here would strip the caller's remaining phases of their
      // mutual exclusion mid-operation
      if (!claimHeld) fs.delete(claim, false)
    }
  }
}
