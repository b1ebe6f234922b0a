package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Growing IVFADC (IVF + PQ) vector store — the DENSE-retrieval twin
  * of [[PostingsIngest]] (embedding batches arriving continuously from
  * an encoder join the searchable ANN index forever). Completes the
  * production retrieval shape: with this module BOTH hybrid legs are
  * growable — lexical via the BM25 postings store, dense via this one
  * — under the same store/consolidate/serve discipline.
  *
  * Layout:
  *   - hot store `path/vecs/batch_id=<id>/` — raw (vec_id, embedding)
  *     per micro-batch, the [[EventStreams.idempotentParquetSink]]
  *     exactly-once layout (replays overwrite only themselves).
  *     [[Compaction.compact]] bounds its dir growth, but ONLY below
  *     the index watermark (`safeBelow <= consolidatedThrough + 1`):
  *     compact folds batches into the LOWEST eligible id, so folding
  *     an unconsolidated batch under the floor would silently drop it
  *     from every future incremental encode (spec-pinned);
  *   - `indexPath/quantizer/{centroids,codebooks}` — trained ONCE at
  *     the first consolidation on everything ingested so far, then
  *     FROZEN (FAISS discipline: new vectors are encoded against the
  *     frozen quantizer — silently drifting codebooks would make old
  *     codes score wrong. A RETRAIN is a fresh index: the hot store
  *     keeps every raw vector, so `consolidate` into a new indexPath
  *     rebuilds quantizer + codes from scratch and the caller cuts
  *     over — no in-place two-artifact swap window to defend);
  *   - `indexPath/tombstones/batch_id=<id>/` — permanent takedowns
  *     ([[tombstone]]): hidden at serve immediately, skipped at
  *     encode, physically purged at rebase; batches at or below the
  *     purge stamp fold into `indexPath/tombstones_snapshot/v=<n>/`
  *     ([[TombstoneStore]], r18) so the takedown forest's dir count
  *     stays bounded by the requests landed since the last purge;
  *   - `indexPath/index/gen=<through>/cell=<c>/` — the codes forest:
  *     each consolidation encodes ONLY batches newer than the stamped
  *     watermark and lands exactly one new generation, prior gens stay
  *     byte-untouched ([[PostingsIngest.consolidate]]'s incremental
  *     contract, including the floor = max(watermark, max gen on disk)
  *     crash-window guard).
  *
  * Serving ([[searchGrown]]) derives the probed cells driver-side
  * (the centroids are quantizer-sized and already driver-held), then
  * points the scan at the probed `gen=<g>/cell=<c>` leaf directories
  * EXPLICITLY — file discovery costs O(gens x nProbe), not O(index
  * dirs) — with the cell isin kept on the scan as defense in depth
  * (the [[graft.operators.IndexStore.bm25FromIndex]] probe shape).
  *
  * At 100 TB: state is parquet only; a batch's ingest write shuffles
  * nothing; consolidation cost is proportional to NEW data (encode is
  * one fused-kernel projection per new vector plus one partitionBy
  * shuffle of 16-byte codes); the quantizer is the only driver-held
  * object and is bounded by (nCentroids + m x ksub) x dim floats
  * regardless of corpus size; search reads only probed cells' code
  * files — raw embeddings are never read at serve time.
  */
object AnnIngest {

  /** One micro-batch step, exposed for spec-level direct use. */
  def ingestBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    EventStreams.idempotentParquetSink(s"$path/vecs")(
      batch.select(col("vec_id"), col("embedding")), batchId)

  def start(vecStream: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, path))
      .start()

  private val BatchDir = "batch_id=(\\d+)".r
  private val GenDir = "gen=(\\d+)".r

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def numberedDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      pat: scala.util.matching.Regex): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { s =>
      s.getPath.getName match {
        case pat(id) if s.isDirectory => Some(id.toLong -> s.getPath)
        case _                        => None
      }
    }

  /** Permanent takedown of vec_ids (deletion requests, right-to-be-
    * forgotten): tombstones land in `indexPath/tombstones/batch_id=`
    * through the same idempotent sink as every store write. The
    * contract is three-layered, weakest first:
    *   1. SERVE-time: [[searchGrown]] anti-joins the tombstone set —
    *      a deleted vector can never appear in a result from the
    *      moment the tombstone batch commits, including under
    *      `asOfGen` time travel (a takedown overrides snapshots —
    *      that is what takedown means);
    *   2. ENCODE-time: [[consolidate]] skips tombstoned vectors in
    *      new batches, so they never enter fresh generations;
    *   3. REBASE-time: the fold physically purges tombstoned rows
    *      from the codes forest.
    * The tombstone store itself is permanent — a re-ingested deleted
    * id stays dead (takedown is forever, not a soft hide). The set is
    * an operational takedown list (bounded by requests, not corpus),
    * so the serve-path anti-join broadcasts. The quantizer is NOT
    * retrained on delete (FAISS posture: codebooks summarize geometry,
    * not membership); a compliance regime that requires scrubbing the
    * quantizer itself retrains into a fresh index from the hot store. */
  def tombstone(ids: DataFrame, batchId: Long, indexPath: String,
      maxWaitMs: Long = 0L): Unit =
    TombstoneStore.writeGuarded(ids.select(col("vec_id")), batchId,
      indexPath, maxWaitMs)

  private def tombstones(spark: SparkSession,
      indexPath: String): Option[DataFrame] =
    TombstoneStore.read(spark, indexPath, "vec_id")

  /** The index's stamped consolidation watermark: every store batch
    * with `batch_id <= through` is already encoded into the forest.
    * None = no consolidation has completed at this path yet. */
  def consolidatedThrough(spark: SparkSession, indexPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, "_through")
    graft.core.Markers.read(fsOf(spark, p), p).map(_.toLong)
  }

  /** Load the frozen quantizer (coarse centroids + PQ codebooks). */
  def loadQuantizer(spark: SparkSession,
      indexPath: String): (Seq[(Long, Seq[Float])], Seq[Seq[Seq[Float]]]) = {
    val centroids = spark.read.schema(StoreSchemas.quantCentroids)
      .parquet(s"$indexPath/quantizer/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      .sortBy(_._1)
    val rows = spark.read.schema(StoreSchemas.quantCodebooks)
      .parquet(s"$indexPath/quantizer/codebooks")
      .orderBy("sub_j", "cell").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    (centroids, books)
  }

  /** Offline maintenance, INCREMENTAL (the [[PostingsIngest.consolidate]]
    * discipline): encode only store batches newer than the stamped
    * watermark against the frozen quantizer, landing exactly one new
    * `gen=` generation. The FIRST consolidation additionally trains
    * the quantizer on everything ingested so far and installs it via
    * scratch + rename (a crash mid-train leaves no quantizer, so the
    * retry re-trains; a crash after install re-uses the frozen one —
    * either way codes and codebooks can never disagree).
    *
    * Training params (nCentroids, m, ksub, iters) only apply to that
    * first training run; later calls verify the caller's shape against
    * the frozen artifact's stamped REQUEST and fail loudly on a
    * mismatch rather than silently encoding against different geometry
    * than requested.
    *
    * `trainCap`: bound the TRAINING set (encode still covers every
    * vector). k-means/PQ training needs a corpus-representative sample
    * — a few hundred vectors per codeword, not the corpus (the FAISS
    * guidance) — so at 100 TB the first consolidation trains on a
    * capped deterministic sample (lowest xxhash64(vec_id) order: a
    * TakeOrderedAndProject, never a full collect or a full extra scan)
    * and only the ENCODE pass touches everything. Default uncapped:
    * gate-scale corpora are smaller than any sensible cap, and the
    * spec's one-shot-equality pin needs the whole corpus as the
    * training set on both sides. */
  def consolidate(spark: SparkSession, path: String, indexPath: String,
      nCentroids: Int = 8, ivfIters: Int = 2, m: Int = 16, ksub: Int = 256,
      pqIters: Int = 3, dim: Int = Similarity.PlaneDims,
      trainCap: Option[Int] = None): Unit = {
    import spark.implicits._
    val idx = new org.apache.hadoop.fs.Path(indexPath)
    val fs = fsOf(spark, idx)
    val batches = numberedDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/vecs"), BatchDir)
    if (batches.isEmpty) return
    val through = batches.map(_._1).max
    val prev = consolidatedThrough(spark, indexPath).getOrElse(-1L)
    if (through <= prev) return
    val genRoot = new org.apache.hadoop.fs.Path(idx, "index")
    // a crashed rebase may hold the REAL forest in its recovery dirs;
    // consolidating on top of the partial view would strand that data
    require(!fs.exists(new org.apache.hadoop.fs.Path(idx, ".rebase-scratch-index"))
        && !fs.exists(new org.apache.hadoop.fs.Path(idx, ".rebase-old-index")),
      s"index at $indexPath has rebase recovery state pending — run " +
        "AnnIngest.rebase to settle it before consolidating")
    GenForest.requireNoLegacyRecoveryDirs(fs, idx)
    // floor guard: a run that crashed after its gen rename but before
    // the watermark write leaves maxGen > watermark; folding from the
    // watermark again would duplicate every vector that gen covers
    val maxGen = numberedDirs(fs, genRoot, GenDir)
      .map(_._1).maxOption.getOrElse(-1L)
    val floor = math.max(prev, maxGen)
    val newBatches = batches.filter(_._1 > floor).sortBy(_._1)

    val runId = java.util.UUID.randomUUID().toString
    val claim = new org.apache.hadoop.fs.Path(idx, "_consolidate_commit")
    if (!graft.core.Markers.tryCreate(fs, claim, s"$runId\n$through"))
      throw new IllegalStateException(
        s"index $indexPath already has a consolidation in flight (or a " +
          "dead one's marker) — if no consolidator is live, delete " +
          s"$claim and re-run (every phase is idempotent)")
    try {
      fs.mkdirs(idx)
      // QUANTIZER: train-once-then-frozen. Trains on the union of ALL
      // store batches visible now (not just the new ones) — the first
      // consolidation is the one chance to see the widest corpus.
      val quant = new org.apache.hadoop.fs.Path(idx, "quantizer")
      if (!fs.exists(quant)) {
        val all = spark.read.option("basePath", s"$path/vecs")
          .schema(StoreSchemas.vecsBatch)
          .parquet(batches.map(_._2.toString): _*)
          .select(col("vec_id"), col("embedding"))
        val train = trainCap match {
          case Some(cap) => all
            .withColumn("__h", xxhash64(col("vec_id")))
            .orderBy("__h").limit(cap).drop("__h")
          case None => all
        }
        val pinned = graft.core.Materialize.pin(train)
        // capped sample → hash seeding (the sample may hold none of
        // the low vec_ids the default seed rule needs); uncapped keeps
        // the one-shot build's seed rule so the spec's grown-vs-one-
        // shot equality compares identically-trained quantizers
        val (assigned, centroids) =
          Similarity.ivfIndexWithCentroids(pinned, nCentroids, ivfIters,
            seedByHash = trainCap.isDefined)
        val resid = graft.core.Materialize.pin(
          Similarity.residualFrame(pinned, assigned, centroids))
        val books = Similarity.pqCodebooks(resid, m, ksub, pqIters, dim)
        val scratch = new org.apache.hadoop.fs.Path(idx, ".quantizer-scratch")
        if (fs.exists(scratch)) fs.delete(scratch, true)
        centroids.toDF("cell", "centroid")
          .write.mode("errorifexists")
          .parquet(new org.apache.hadoop.fs.Path(scratch, "centroids").toString)
        books.zipWithIndex.flatMap { case (bk, j) =>
          bk.zipWithIndex.map { case (cw, c) => (j, c, cw) }
        }.toDF("sub_j", "cell", "codeword")
          .write.mode("errorifexists")
          .parquet(new org.apache.hadoop.fs.Path(scratch, "codebooks").toString)
        // the stamp records the training REQUEST, not the product —
        // k-means can legitimately produce fewer cells than asked
        // (the seed set is corpus-dependent), and the check below must
        // not reject a store whose first batch trained thin
        graft.core.Markers.forceWrite(fs,
          new org.apache.hadoop.fs.Path(scratch, "_shape"), s"$nCentroids $m")
        require(fs.rename(scratch, quant),
          s"failed to install quantizer at $quant")
      }
      val shape = graft.core.Markers.read(fs,
        new org.apache.hadoop.fs.Path(quant, "_shape")).get.split(" ")
      require(shape(0).toInt == nCentroids && shape(1).toInt == m,
        s"index at $indexPath has a frozen quantizer trained at " +
          s"${shape(0)} cells x ${shape(1)} subspaces; an " +
          s"incremental run cannot switch to $nCentroids x $m — " +
          "rebuild the index to retrain, or pass the frozen shape")
      val (centroids, books) = loadQuantizer(spark, indexPath)
      // ENCODE the new batches against the frozen quantizer — reads
      // EXACTLY the new batch dirs, lands via scratch + rename so
      // readers never see a half-written generation.
      val genDir = new org.apache.hadoop.fs.Path(idx, s"index/gen=$through")
      if (newBatches.nonEmpty && !fs.exists(genDir)) {
        val vecs = spark.read.option("basePath", s"$path/vecs")
          .schema(StoreSchemas.vecsBatch)
          .parquet(newBatches.map(_._2.toString): _*)
          .select(col("vec_id"), col("embedding"))
        val alive = tombstones(spark, indexPath) match {
          case Some(t) => vecs.join(broadcast(t), Seq("vec_id"), "left_anti")
          case None    => vecs
        }
        val pinnedNew = graft.core.Materialize.pin(alive)
        val assigned = Similarity.assignCells(
          pinnedNew.select(col("vec_id"), col("embedding")), centroids)
        val resid = Similarity.residualFrame(pinnedNew, assigned, centroids)
        val scratch = new org.apache.hadoop.fs.Path(idx, ".index-scratch")
        if (fs.exists(scratch)) fs.delete(scratch, true)
        Similarity.pqEncode(resid, books)
          .join(assigned, Seq("vec_id"))
          // row-level source identity: survives rebase folds so as-of
          // reads older than a fold point still serve exactly
          .withColumn("src_gen", lit(through))
          .write.mode("errorifexists").partitionBy("cell")
          .parquet(scratch.toString)
        // the tombstone skip can empty a NONEMPTY batch — an
        // all-marker gen dir must not be installed
        if (!GenForest.hasDataFiles(fs, scratch)) fs.delete(scratch, true)
        else {
          // cutoff = the tombstone watermark this gen's rows REFLECT.
          // The dir-listing max alone understates it once maintain has
          // folded purged batches into one low-id segment — the purge
          // stamp restores the true floor (everything at or below it
          // was certainly anti-joined here, its rows are already gone
          // from the corpus this encode reads)
          GenForest.writeGensMarker(fs, scratch, Map(through -> math.max(
            numberedDirs(fs, new org.apache.hadoop.fs.Path(idx, "tombstones"),
              BatchDir).map(_._1).maxOption.getOrElse(-1L),
            graft.core.Markers.read(fs,
              new org.apache.hadoop.fs.Path(idx, "_purged"))
              .map(_.toLong).getOrElse(-1L))))
          fs.mkdirs(genRoot)
          require(fs.rename(scratch, genDir),
            s"failed to install consolidated generation at $genDir")
        }
      }
      fs.mkdirs(genRoot)
      // WATERMARK last — the run's single durable commit point
      graft.core.Markers.forceWrite(fs,
        new org.apache.hadoop.fs.Path(idx, "_through"), through.toString)
    } finally {
      // phases are individually idempotent, so the lease can always be
      // released: a failed run is finished by calling consolidate again
      fs.delete(claim, false)
    }
  }

  /** Major compaction: fold every generation into one base gen (codes
    * move, nothing is re-encoded — the quantizer is frozen, so a
    * layout fold can never change a single code byte). Same claim and
    * two-way crash recovery as [[PostingsIngest.rebase]], via the
    * shared [[GenForest]] skeleton. */
  def rebase(spark: SparkSession, indexPath: String): Unit = {
    val wm = consolidatedThrough(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"index at $indexPath has no consolidation watermark — nothing to rebase"))
    // the fold is where tombstoned rows leave the disk: the serve path
    // already hides them, so the purge is pure space/scan reclamation
    val idx = new org.apache.hadoop.fs.Path(indexPath)
    val fs = fsOf(spark, idx)
    val tombs = tombstones(spark, indexPath)
    // a purge is a LOSSY fold, so it must run even on a single-gen
    // forest — but only while tombstone batches newer than the purge
    // stamp exist, or every later rebase would re-fold the whole
    // forest forever against a permanent (never-shrinking) set
    val (maxTomb, unpurged) = tombstoneState(fs, idx)
    GenForest.rebase(spark, indexPath, forestName = "index", wm = wm,
      partitionCols = Seq("cell"), forceFold = unpurged,
      foldCutoff = if (unpurged) maxTomb else None,
      schema = Some(StoreSchemas.codesForest)) { forest =>
      val base = forest.drop("gen") // src_gen (data column) rides through
      tombs match {
        case Some(t) => base.join(broadcast(t), Seq("vec_id"), "left_anti")
        case None    => base
      }
    }
    // stamp AFTER the fold lands (crash in between re-folds on retry,
    // never the reverse), with the PRE-fold listing's max — see
    // tombstoneState on why re-listing here would lose a concurrent
    // tombstone batch
    maxTomb.foreach(m => graft.core.Markers.forceWrite(fs,
      new org.apache.hadoop.fs.Path(idx, "_purged"), m.toString))
  }

  /** (max tombstone batch id on disk, whether any of them postdate
    * the purge stamp). The max is captured in the SAME listing the
    * decision uses: a rebase must stamp exactly what it saw before
    * folding — re-listing after the fold would mark a concurrently
    * landed tombstone batch purged without it ever being folded. */
  private def tombstoneState(fs: org.apache.hadoop.fs.FileSystem,
      idx: org.apache.hadoop.fs.Path): (Option[Long], Boolean) = {
    val maxBatch = numberedDirs(fs,
      new org.apache.hadoop.fs.Path(idx, "tombstones"), BatchDir)
      .map(_._1).maxOption
    val purged = graft.core.Markers.read(fs,
      new org.apache.hadoop.fs.Path(idx, "_purged")).map(_.toLong).getOrElse(-1L)
    (maxBatch, maxBatch.exists(_ > purged))
  }

  /** One-call maintenance runbook (the [[VecIngest.maintainStores]]
    * shape for this store): consolidate whatever is new, rebase when
    * the generation count passes `rebaseAtGens` OR `purgeAtBatches`
    * tombstone batches are unpurged, then compact the hot store below
    * the watermark (the only compaction range the floor contract
    * allows — see the layout doc). Each step is independently
    * idempotent and crash-safe, so a scheduler can fire this blindly
    * on a timer.
    *
    * `purgeAtBatches` (r20): the [[PostingsIngest.maintain]] knob,
    * same contract — the purging rebase is O(live forest), so
    * takedown-heavy deployments set k > 1 to pay it once per k
    * batches; serve-side hiding is immediate from the tombstone
    * commit regardless, only physical-deletion latency grows
    * (bounded by k cycles; post-maintain tombstone dirs <= 2k-1). */
  def maintain(spark: SparkSession, path: String, indexPath: String,
      rebaseAtGens: Int = 8, purgeAtBatches: Int = 1): Unit = {
    require(purgeAtBatches >= 1,
      s"purgeAtBatches must be >= 1, got $purgeAtBatches")
    consolidate(spark, path, indexPath)
    val idx = new org.apache.hadoop.fs.Path(indexPath)
    val fs = fsOf(spark, idx)
    val gens = numberedDirs(fs,
      new org.apache.hadoop.fs.Path(idx, "index"), GenDir).size
    val purged = graft.core.Markers.read(fs,
      new org.apache.hadoop.fs.Path(idx, "_purged")).map(_.toLong)
      .getOrElse(-1L)
    val unpurged = numberedDirs(fs,
      new org.apache.hadoop.fs.Path(idx, "tombstones"), BatchDir)
      .map(_._1).count(_ > purged)
    if (gens > rebaseAtGens || unpurged >= purgeAtBatches)
      rebase(spark, indexPath)
    consolidatedThrough(spark, indexPath).foreach { wm =>
      // tiered: the blind-timer amortization rationale at
      // [[PostingsIngest.maintain]]
      Compaction.compactTiered(spark, s"$path/vecs", safeBelow = wm + 1)
    }
    // TOMBSTONE-DIR bound (r18): the takedown forest grows one
    // `batch_id=` dir per request batch FOREVER — after the
    // rebaseAtGens fold and the hot-store compact above, the only
    // unbounded listing bill left in this layout (the quantizer is one
    // frozen artifact and there are no per-gen sidecars to bound; the
    // serve/encode/purge paths all read tombstones as a SET). Batches
    // at or below the purge stamp fold into the out-of-namespace
    // [[TombstoneStore]] snapshot — NOT via Compaction.compact, whose
    // collapsed segment a replayed tombstone write could dynamic-
    // overwrite, silently shrinking the permanent set. (The postings
    // store, whose serve-time corrections read batch ids as DATA,
    // bounds its forest with the row-preserving foldRows variant —
    // r19, [[PostingsIngest.maintain]].)
    graft.core.Markers.read(fs, new org.apache.hadoop.fs.Path(idx, "_purged"))
      .map(_.toLong).foreach { purged =>
        TombstoneStore.fold(spark, indexPath, purged, "vec_id")
      }
  }

  /** ANN search against everything consolidated so far: frozen
    * quantizer loaded (driver-sized by contract), coarse probe run
    * driver-side, scan pointed at the probed `gen=<g>/cell=` leaf dirs
    * explicitly, ADC scoring via the shared fused kernel. Vectors
    * ingested after the last consolidate are NOT visible — the
    * postings store's freshness contract; callers needing read-your-
    * writes run consolidate first (cost bounded by the new batches).
    *
    * `asOfGen`: pin the read to SOURCE generations `<= asOfGen` —
    * snapshot serving (each src gen id is the consolidation watermark
    * that produced it, so as-of-watermark IS as-of-gen). Cheap here
    * because the codes forest carries no cross-generation aggregate:
    * leaf dirs filter by their `_gens` markers' src sets, plus a
    * row-level `src_gen` filter inside rebase-folded dirs — so
    * snapshots older than a fold point still serve exactly (the same
    * no-horizon contract as the BM25 twin's per-gen sidecars). */
  def searchGrown(emb: DataFrame, spark: SparkSession, indexPath: String,
      nQueries: Int, k: Int, nProbe: Int = 2,
      asOfGen: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val (centroids, books) = loadQuantizer(spark, indexPath)
    val probesLocal = Similarity.coarseProbeLocal(emb, centroids, nQueries, nProbe)
    val cellNames = probesLocal.map(_._3).distinct.map(c => s"cell=$c").toSet
    val rootPath = new org.apache.hadoop.fs.Path(s"$indexPath/index")
    val fs = fsOf(spark, rootPath)
    val leafDirs: Seq[String] =
      if (!fs.exists(rootPath)) Seq.empty
      else numberedDirs(fs, rootPath, GenDir)
        .filter { case (g, gp) => asOfGen.forall(a =>
          GenForest.readGensMarker(fs, gp, g).keys.exists(_ <= a)) }
        .flatMap { case (_, gp) =>
          fs.listStatus(gp).toSeq
            .map(_.getPath.getName).filter(cellNames.contains)
            .map(cell => s"$indexPath/index/${gp.getName}/$cell")
        }
    if (leafDirs.isEmpty)
      return Seq.empty[(Long, Long, Int)]
        .toDF("query_id", "neighbor_id", "rank")
    val scanned = spark.read.option("basePath", s"$indexPath/index")
      .schema(StoreSchemas.codesForest)
      .parquet(leafDirs: _*)
      .filter(asOfGen.map(a => col("src_gen") <= a).getOrElse(lit(true)))
      .select(col("vec_id"), col("cell"), col("codes"))
    // takedowns are hidden at serve time, even under asOfGen — a
    // snapshot read must not resurrect a deleted vector
    val index = tombstones(spark, indexPath) match {
      case Some(t) => scanned.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None    => scanned
    }
    Similarity.ivfPqScoreProbed(index, probesLocal, centroids, books, k)
  }

  // ---- driver gate row ------------------------------------------------

  /** Gate query (`x_sim_ann_grown`): pump `embeddings` into a fresh
    * store in three deterministic batches, consolidate into the gen
    * forest (first call trains the quantizer on the full corpus), and
    * search through the grown serve path — the [[Similarity.annRecall]]
    * reduction against brute force proves the grow → train → encode →
    * serve cycle holds the same recall contract as the one-shot
    * IVFADC artifact row. Fresh store per call, the
    * [[Compaction.compactionGate]] discipline. */
  val grownGate: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = s"${sys.props("java.io.tmpdir")}/graft_annstore/gate_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true)
    val emb = graft.core.Tables.t(s, dir, "embeddings")
    for (b <- 0L until 3L)
      ingestBatch(emb.filter(pmod(col("vec_id"), lit(3)) === b), b, s"$root/store")
    // Gate config, measured (r15 sweep over ksub x pqIters x ivfIters x
    // trainCap at sf0.001/0.01/0.1): pqIters=1 reads the SAME recall as
    // the one-shot default 3 (0.70/0.72/0.60 vs 0.72/0.72/0.62 — the
    // hash-order init IS ksub sampled vectors, so Lloyd refinement
    // converges in one pass here) at less than half the training cost.
    // Training stays UNCAPPED: trainCap switches the IVF seed rule to
    // hash order, which measured -0.2 recall on this corpus at every
    // SF (0.72 -> 0.52 at sf0.01) — the capability is spec-covered,
    // the gate keeps the strong quantizer.
    consolidate(s, s"$root/store", s"$root/index", pqIters = 1)
    val ann = searchGrown(emb, s, s"$root/index", nQueries = 10, k = 5)
    Similarity.annRecall(ann, Similarity.cosineTopK(emb, nQueries = 10, k = 5),
        minRecall = 0.4)
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("x_sim_ann_grown" -> grownGate)

  /** Same reduction shape as the one-shot IVFADC row — shares its
    * exact-top-k oracle. */
  val oracles: Map[String, String] =
    Map("x_sim_ann_grown" -> Similarity.oracles("x_sim_ivfpq_ann"))
}
