package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed index artifacts for the dedup/ANN operators.
  *
  * The inline query paths materialize their index frames with
  * `localCheckpoint()` — correct at local[32], but checkpoint blocks
  * die with an executor on a real cluster (no lineage to rebuild) and
  * with the session either way. At corpus scale these indices are
  * build-once / query-many artifacts, so this module gives each one a
  * durable form: `build*Index(..., path)` writes parquet,
  * `load*Index(spark, path)` reads it back, and the `*FromIndex`
  * query shapes run the search stage against the loaded frame.
  * IndexStoreSpec checks every from-index path produces output equal
  * to its inline twin.
  *
  * Index sizes (why parquet is cheap here): minhash bands are 8 ints +
  * a long per doc, simhash one long per doc, LSH buckets NumTables
  * ints per vector, IVF one cell id per vector + centroids (tiny).
  * None of them store payloads — verification joins back to the
  * corpus table, pruned to candidates.
  */
object IndexStore {

  /** Canonical scratch location for a (kind, source-dir) index build —
    * keyed by the data dir so different scale factors never collide. */
  def defaultPath(kind: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_index/${kind}_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  // ---- Verified similarity-graph edge list: (a, b) with a < b ----

  /** Materialize the verified Jaccard near-dup edge list — the input
    * every graph gate (triangles / PageRank / k-core / LPA /
    * link-prediction) derives — as a durable parquet artifact. The
    * edge derivation is the expensive stage of all five graph queries
    * (~2s each at gate scale, the whole similarity self-join at corpus
    * scale), and it is build-once / query-many by nature: analytics
    * re-run nightly against the same day's graph. */
  def buildEdgeIndex(docs: DataFrame, path: String,
      minJaccard: Double = 0.5,
      maxDf: Option[Long] = Some(Dedup.GateMaxDf)): Unit =
    Dedup.jaccardPairs(Dedup.shingles(docs), minJaccard, maxDf = maxDf)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .write.mode("overwrite").parquet(path)

  def loadEdgeIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Build-ONCE edge artifact: the first caller per (path, params) per
    * JVM builds, every later caller reuses the parquet on disk — the
    * contract all five `x_graph_*_indexed` gates share, so one bench
    * or verify run pays the edge derivation (the expensive stage of
    * every graph query) exactly once for five analytics. Memoized
    * per-JVM, never across JVMs: a fresh session always rebuilds on
    * first touch, so a stale artifact from an earlier run with
    * different inputs can never be served ([[defaultPath]] keying by
    * data dir already prevents cross-scale-factor collisions within a
    * run). `computeIfAbsent` blocks concurrent first callers until the
    * build commits. */
  private val builtEdge = new java.util.concurrent.ConcurrentHashMap[String, Unit]()
  private def once(key: String)(build: => Unit): Unit =
    builtEdge.computeIfAbsent(key, _ => build)
  def ensureEdgeIndex(docs: DataFrame, path: String,
      minJaccard: Double = 0.5,
      maxDf: Option[Long] = Some(Dedup.GateMaxDf)): Unit =
    once(s"edge|$path|$minJaccard|$maxDf")(
      buildEdgeIndex(docs, path, minJaccard, maxDf))

  /** Archive cluster labels — the 90% slice of the verified edge list
    * clustered once and persisted, the production shape incremental
    * clustering maintains: yesterday's (doc_id, canonical_id)
    * assignment already exists on disk, and today's work is ONLY the
    * label-lookup join plus a batch-bounded CC over the new pairs
    * ([[Dedup.clustersIncremental]]). Built from the shared edge
    * artifact, so one bench/verify run derives the similarity graph
    * once for the five graph gates AND this one. */
  def buildClusterLabels(spark: SparkSession, edgePath: String,
      path: String): Unit =
    Dedup.canonicalClusters(
      loadEdgeIndex(spark, edgePath)
        .select(col("a").as("doc_a"), col("b").as("doc_b"))
        .filter(pmod(xxhash64(col("doc_a"), col("doc_b")), lit(10)) =!= 9))
      .write.mode("overwrite").parquet(path)

  def ensureClusterLabels(spark: SparkSession, edgePath: String,
      path: String): Unit =
    once(s"cclabels|$edgePath|$path")(
      buildClusterLabels(spark, edgePath, path))

  /** Build-once variants for the ANN artifact gates — the same per-JVM
    * memoization contract as [[ensureEdgeIndex]]: one bench/verify run
    * pays each index build exactly once (production shape: index once,
    * query many; a min-of-k bench rerun then times the SEARCH, not a
    * redundant rebuild), while a fresh session always rebuilds on
    * first touch so stale artifacts are never served. */
  def ensureLshIndex(emb: DataFrame, path: String,
      dim: Int = Similarity.PlaneDims): Unit =
    once(s"lsh|$path|$dim")(buildLshIndex(emb, path, dim))

  def ensureIvfIndex(emb: DataFrame, path: String, nCentroids: Int,
      iters: Int = 2): Unit =
    once(s"ivf|$path|$nCentroids|$iters")(
      buildIvfIndex(emb, path, nCentroids, iters))

  def ensurePqIndex(emb: DataFrame, path: String, m: Int = 16,
      ksub: Int = 256, iters: Int = 3,
      dim: Int = Similarity.PlaneDims): Unit =
    once(s"pq|$path|$m|$ksub|$iters|$dim")(
      buildPqIndex(emb, path, m, ksub, iters, dim))

  def ensureIvfPqIndex(emb: DataFrame, path: String, nCentroids: Int = 8,
      ivfIters: Int = 2, m: Int = 16, ksub: Int = 256, pqIters: Int = 3,
      dim: Int = Similarity.PlaneDims): Unit =
    once(s"ivfpq|$path|$nCentroids|$ivfIters|$m|$ksub|$pqIters|$dim")(
      buildIvfPqIndex(emb, path, nCentroids, ivfIters, m, ksub, pqIters, dim))

  // ---- MinHash LSH band index: (doc_id, band, bh) ----

  def buildMinhashIndex(docs: DataFrame, path: String): Unit =
    Dedup.minhashBands(docs)
      .write.mode("overwrite").parquet(path)

  def loadMinhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---- SimHash signature index: (doc_id, simhash) ----

  def buildSimhashIndex(docs: DataFrame, path: String): Unit =
    Dedup.simhash(docs)
      .write.mode("overwrite").parquet(path)

  def loadSimhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup pairs over a corpus whose signatures were indexed ahead
    * of time — the banding + verification stage only. */
  def simhashPairsFromIndex(spark: SparkSession, path: String,
      maxHamming: Int): DataFrame =
    Dedup.simhashPairsFromSigs(loadSimhashIndex(spark, path), maxHamming)

  // ---- LSH ANN bucket index: (vec_id, tbl, bucket) ----

  def buildLshIndex(emb: DataFrame, path: String,
      dim: Int = Similarity.PlaneDims): Unit =
    Similarity.lshBandIndex(emb, dim)
      .write.mode("overwrite").parquet(path)

  def loadLshIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def lshAnnFromIndex(emb: DataFrame, spark: SparkSession, path: String,
      nQueries: Int, k: Int): DataFrame =
    Similarity.lshSearch(emb, loadLshIndex(spark, path), nQueries, k)

  // ---- IVF index: assignments (vec_id, cell) + centroids (cell, centroid) ----

  def buildIvfIndex(emb: DataFrame, path: String, nCentroids: Int,
      iters: Int = 2): Unit = {
    import emb.sparkSession.implicits._
    val (assigned, centroids) = Similarity.ivfIndexWithCentroids(emb, nCentroids, iters)
    assigned.write.mode("overwrite").parquet(s"$path/assignments")
    centroids.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** (assignments frame, driver-held centroid set). The centroid
    * collect is nCentroids * dim floats — the coarse quantizer, always
    * driver-sized. */
  def loadIvfIndex(spark: SparkSession, path: String): (DataFrame, Seq[(Long, Seq[Float])]) = {
    val assigned = spark.read.parquet(s"$path/assignments")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    (assigned, centroids)
  }

  def ivfAnnFromIndex(emb: DataFrame, spark: SparkSession, path: String,
      nQueries: Int, k: Int, nProbe: Int = 2): DataFrame = {
    val (assigned, centroids) = loadIvfIndex(spark, path)
    Similarity.ivfSearch(emb, assigned, centroids, nQueries, k, nProbe)
  }

  // ---- PQ index: codes (vec_id, codes) + codebooks (sub_j, cell, codeword) ----

  /** Train codebooks + encode the corpus, both to parquet. The codes
    * table is the index (m small ints per vector — 32x smaller than
    * the embedding column it replaces at search time); the codebooks
    * table is the quantizer (m * ksub * dim/m floats, always
    * driver-sized). */
  def buildPqIndex(emb: DataFrame, path: String, m: Int = 16,
      ksub: Int = 256, iters: Int = 3,
      dim: Int = Similarity.PlaneDims): Unit = {
    import emb.sparkSession.implicits._
    val books = Similarity.pqCodebooks(emb, m, ksub, iters, dim)
    Similarity.pqEncode(emb, books)
      .write.mode("overwrite").parquet(s"$path/codes")
    books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (cw, c) => (j, c, cw) }
    }.toDF("sub_j", "cell", "codeword")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** (codes frame, driver-held codebooks — books(j)(c) = codeword). */
  def loadPqIndex(spark: SparkSession, path: String): (DataFrame, Seq[Seq[Seq[Float]]]) = {
    val codes = spark.read.parquet(s"$path/codes")
    val rows = spark.read.parquet(s"$path/codebooks")
      .orderBy("sub_j", "cell").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    (codes, books)
  }

  def pqTopKFromIndex(emb: DataFrame, spark: SparkSession, path: String,
      nQueries: Int, k: Int): DataFrame = {
    val (codes, books) = loadPqIndex(spark, path)
    Similarity.pqSearch(emb, codes, books, nQueries, k)
  }

  // ---- BPE merge table: (rank, l, r, n) — the tokenizer artifact ----

  /** Train [[Corpus.bpeMerges]] and persist the ordered merge table —
    * THE artifact a tokenizer is: train once on the corpus, encode
    * with the loaded table forever after ([[Corpus.bpeEncodeWords]]).
    * Round13Spec proves trainer/encoder state equivalence (encoding
    * with the first n merges reproduces exactly the symbol state the
    * trainer's round n+1 counted). */
  def buildBpeMerges(docs: DataFrame, path: String, nMerges: Int): Unit = {
    import docs.sparkSession.implicits._
    Corpus.bpeMerges(docs, nMerges)
      .toDF("rank", "l", "r", "n")
      .write.mode("overwrite").parquet(path)
  }

  /** Ordered (left, right) merge pairs, ready for
    * [[Corpus.bpeEncodeWords]]. */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  // ---- IVFADC index: one (vec_id, cell, codes) table + centroids + codebooks ----

  /** Coarse cells + PQ codes in ONE index table — cell for partition
    * pruning, codes for in-scan scoring; the search never reads raw
    * embeddings. Written partitioned by cell so a probe's scan prunes
    * to its own cells' directories (the `pb`-tier lesson applied to
    * ANN). */
  def buildIvfPqIndex(emb: DataFrame, path: String, nCentroids: Int = 8,
      ivfIters: Int = 2, m: Int = 16, ksub: Int = 256, pqIters: Int = 3,
      dim: Int = Similarity.PlaneDims): Unit = {
    import emb.sparkSession.implicits._
    val (assigned, centroids) =
      Similarity.ivfIndexWithCentroids(emb, nCentroids, ivfIters)
    // codebooks train on and codes encode the RESIDUAL v - centroid
    // (FAISS-style): the coarse quantizer explains the cell mean, PQ
    // spends its 16 bytes on what is left
    val resid = graft.core.Materialize.pin(
      Similarity.residualFrame(emb, assigned, centroids))
    val books = Similarity.pqCodebooks(resid, m, ksub, pqIters, dim)
    Similarity.pqEncode(resid, books)
      .join(assigned, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
    centroids.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (cw, c) => (j, c, cw) }
    }.toDF("sub_j", "cell", "codeword")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def loadIvfPqIndex(spark: SparkSession, path: String): (DataFrame, Seq[(Long, Seq[Float])], Seq[Seq[Seq[Float]]]) = {
    val index = spark.read.parquet(s"$path/index")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val rows = spark.read.parquet(s"$path/codebooks")
      .orderBy("sub_j", "cell").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    (index, centroids, books)
  }

  // ---- Whitening transform artifact: matrix rows + mean + dim stamp ----

  /** Persist a fitted ZCA whitening transform — a trained transform IS
    * an artifact exactly like a PQ codebook: fit once on a corpus
    * snapshot, apply to every later batch (applying a REFIT transform
    * to previously-whitened data is the classic train/serve skew bug).
    * The meta row stamps (dim, eps) so a load against a mismatched
    * corpus width fails loudly instead of silently projecting prefixes
    * — the same contract as the LSH store's plane-width marker. */
  def buildWhitenIndex(emb: DataFrame, path: String,
      dim: Int = Similarity.PlaneDims, eps: Double = 1e-4): Unit = {
    import emb.sparkSession.implicits._
    val (w, m) = Similarity.whitenParams(emb, dim, eps)
    w.zipWithIndex.map { case (row, i) => (i, row) }.toDF("i", "w")
      .write.mode("overwrite").parquet(s"$path/matrix")
    m.zipWithIndex.map { case (v, p) => (p, v) }.toDF("pos", "m")
      .write.mode("overwrite").parquet(s"$path/mean")
    Seq((dim, eps)).toDF("dim", "eps")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def ensureWhitenIndex(emb: DataFrame, path: String,
      dim: Int = Similarity.PlaneDims, eps: Double = 1e-4): Unit =
    once(s"whiten|$path|$dim|$eps")(buildWhitenIndex(emb, path, dim, eps))

  /** Load (W, mean); verifies the stamped dim matches `expectDim`. */
  def loadWhitenIndex(spark: SparkSession, path: String,
      expectDim: Int = Similarity.PlaneDims): (Seq[Seq[Float]], Seq[Float]) = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    require(meta.getInt(0) == expectDim,
      s"whiten artifact at $path was fitted at dim ${meta.getInt(0)}, " +
        s"caller expects $expectDim — refit or load the matching artifact")
    val w = spark.read.parquet(s"$path/matrix").orderBy("i").collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    val m = spark.read.parquet(s"$path/mean").orderBy("pos").collect()
      .map(_.getFloat(1)).toSeq
    (w, m)
  }

  /** Apply a stored whitening transform — the serve-time path: one
    * fused kernel pass, no refit, no corpus moments. Both halves of
    * the loud artifact-vs-corpus contract cost ZERO extra corpus
    * passes: emptiness is a one-row sample (fails eagerly — an empty
    * corpus is a caller error, not an empty result), and width
    * mismatches raise PER ROW inside the same projection the kernel
    * runs in (`raise_error` on `size != stamped dim`), so a ragged or
    * wrong-width row can never be silently prefix-projected by the
    * fused kernel. The r15 first cut used a min/max length aggregate
    * instead — loud but one full extra scan per serve call, the wrong
    * trade at corpus scale. */
  def whitenFromIndex(emb: DataFrame, spark: SparkSession,
      path: String): DataFrame = {
    require(emb.select(lit(1)).limit(1).collect().nonEmpty,
      "whitenFromIndex: empty corpus — nothing to apply the stored transform to")
    // serve at the STAMPED dim — the corpus is checked against it per
    // row below, so no caller-supplied expectation is needed here
    val stamped = spark.read.parquet(s"$path/meta").collect().head.getInt(0)
    val (w, m) = loadWhitenIndex(spark, path, expectDim = stamped)
    emb.select(col("vec_id"),
      when(size(col("embedding")) === m.size,
        graft.functions.MatVecCentered.matVecCentered(col("embedding"), w, m))
        .otherwise(raise_error(concat(
          lit(s"whitenFromIndex: row width "), size(col("embedding")).cast("string"),
          lit(s" != stored transform dim ${m.size} — a stored dxd transform " +
            "cannot apply; clean the corpus or refit"))))
        .as("embedding"))
  }

  // ---- BM25 inverted-index artifact (postings + dictionary + stats) ----

  /** Token-hash partition count for the postings layout at gate
    * scale. Two forces pull on this number: pruning wants mod LARGE
    * against a query's distinct-term count (the gate's 32 terms
    * against 64 dirs leave ~half the index in scope), directory
    * overhead wants dirs HOLDING real data (the r14 soak measured
    * mod=256 LOSING to mod=64 at an 8M-posting index — 22.3 s build /
    * 3.5 s probe vs 12.4 s / 2.3 s — because listing+opening 4x the
    * files outweighs scanning rows that were already cheap). 64 is
    * the measured balance for gate/soak-sized indexes;
    * [[pbModForPostings]] scales it for real corpora. */
  val PostingsPbMod = 64

  /** Corpus-sized partition mod: smallest power of two putting a
    * directory at ~[[PostingsRowsPerDir]] postings, floored at the
    * gate default and capped at 4096 — the same shape as
    * [[Similarity.planesForCorpus]] (width must fit the corpus, not
    * the query). At 8M postings this returns 64 (the measured
    * balance); at 10^9 it returns 1024; the cap keeps a pathological
    * estimate from exploding the filesystem. */
  val PostingsRowsPerDir = 1000000L
  def pbModForPostings(expectedPostings: Long): Int = {
    require(expectedPostings > 0,
      s"expectedPostings must be positive (got $expectedPostings)")
    val dirs = (expectedPostings + PostingsRowsPerDir - 1) / PostingsRowsPerDir
    // clamp the EXPONENT before shifting — 1 << 43 wraps an Int shift
    // (shift count is mod 32) and would dodge the .min cap below
    val pow = 64 - java.lang.Long.numberOfLeadingZeros((dirs - 1).max(0))
    1 << pow.max(6).min(12) // 2^6 = gate floor, 2^12 = 4096 cap
  }

  /** Persist the classic inverted-index triple: postings
    * (doc_id, tok, tf, dl) partitioned by `pb = hash(tok) mod m` so a
    * probe prunes to its query terms' directories at planning time;
    * dictionary (tok, df) — vocabulary-sized; one-row stats
    * (n, sumdl) stamped with the partition mod (probes re-derive pb
    * with the stamped mod, so a layout change can never silently
    * probe the wrong directories). */
  def buildPostingsIndex(docs: DataFrame, path: String,
      pbMod: Int = PostingsPbMod): Unit = {
    val p = Retrieval.postings(docs)
      .withColumn("pb", pmod(xxhash64(col("tok")), lit(pbMod.toLong)).cast("int"))
    p.write.mode("overwrite").partitionBy("pb").parquet(s"$path/postings")
    // df from the SAME postings frame the payload was written from:
    // "docs containing tok" — one row per (doc, tok) by construction.
    p.groupBy("tok").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/dict")
    Retrieval.corpusStats(docs).withColumn("pb_mod", lit(pbMod))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  def ensurePostingsIndex(docs: DataFrame, path: String,
      pbMod: Int = PostingsPbMod): Unit =
    once(s"postings|$path|$pbMod")(buildPostingsIndex(docs, path, pbMod))

  /** BM25 search against the stored index — the serve-time path: the
    * query terms' pb set is computed with the STAMPED mod (one tiny
    * job over the literal token frame, probedCells-sized collect) and
    * planted as a static isin on the partition column, so the
    * postings scan prunes to the query terms' directories at planning
    * time under either parquet reader (the IVFADC move; RetrievalSpec
    * asserts the PartitionFilters). The dictionary supplies df, so
    * output is identical to [[Retrieval.bm25TopK]] by construction. */
  /** `asOfGen`: pin the probe to SOURCE generations `<= asOfGen` —
    * snapshot serving on the grown layout (each src gen id is the
    * consolidation watermark that produced it). All three as-of
    * readings are folds over per-src-gen artifacts: leaf dirs filter
    * by their `_gens` markers' src sets (plus a row-level `src_gen`
    * filter inside rebase-folded dirs), (n, sumdl) sums the stats
    * rows with gen <= asOf, and df sums the dict DELTAS with gen <=
    * asOf — the same dictionary fold the latest path runs, so an
    * as-of probe re-derives nothing from postings (the r15 serving
    * asymmetry, closed). Takedowns apply under as-of too (a snapshot
    * must not resurrect a deleted doc): corrections scope themselves
    * to tombstones whose recorded src gen is inside the snapshot AND
    * whose batch postdates that gen's sidecar cutoff. Flat one-shot
    * layouts reject as-of. Horizon: NONE — a rebase fold preserves
    * row-level src gens and the sidecars are keyed by them, so
    * snapshots older than a fold point still serve exactly. */
  def bm25FromIndex(docs: DataFrame, spark: SparkSession, path: String,
      nQueries: Int, qLen: Int, k: Int,
      maxDf: Option[Long] = None,
      qtermsIn: Option[Seq[(Long, String)]] = None,
      asOfGen: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val idxRoot = new org.apache.hadoop.fs.Path(path)
    val fsStats = idxRoot.getFileSystem(spark.sessionState.newHadoopConf())
    // sidecar roots resolve to the highest published version dir
    // (grown layout; a flat one-shot index has none and resolves to
    // $path/stats), so a probe overlapping a purge/compaction swap
    // always scans one complete sidecar version. Both roots + the
    // compaction horizon come from ONE index listing (r22 — the serve
    // path paid three listStatus RPCs for them).
    val (statsRoot, dictRoot, horizon) =
      graft.streaming.PostingsIngest.sidecarRootsAndHorizon(fsStats, idxRoot)
    // pb_mod: the index-root marker (grown layout) or the flat
    // one-shot layout's stats column
    val pbMod = graft.core.Markers.read(fsStats,
        new org.apache.hadoop.fs.Path(s"$path/_pb_mod")).map(_.toInt)
      .getOrElse(spark.read.schema(graft.streaming.StoreSchemas.flatStats)
        .parquet(s"$path/stats")
        .select("pb_mod").head().getInt(0))
    val qterms = qtermsIn.getOrElse(
      Retrieval.queryTermsLocal(docs, nQueries, qLen))
    val toks = qterms.map(_._2).distinct
    val tokDf = toks.toDF("tok")
    // pb set computed DRIVER-side: the tokens are already literals, so
    // their partition ids are |q| evaluations of the same Catalyst
    // XxHash64 expression the layout was written with (seed 42) — no
    // Spark job, bit-identical to the frame formulation it replaces
    val pbs = toks.map { t =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
          t, org.apache.spark.sql.types.StringType)), 42L)
        .eval(null).asInstanceOf[Long]
      (((h % pbMod) + pbMod) % pbMod).toInt
    }.distinct
    // The scan is pointed at the pruned LEAF DIRECTORIES explicitly
    // (one listing RPC for the root + one per generation), so file
    // discovery costs O(query pbs), not O(index dirs) — reading the
    // whole root makes Spark list EVERY gen=*/pb=* leaf before the
    // partition filter prunes a single row, the dominant cost of a
    // probe against a grown gen forest (measured 4.2s vs 0.9s at the
    // 8-gen consolidation soak). Works for both layouts: flat pb=
    // dirs (one-shot build) and gen=/pb= (incremental consolidation).
    // The pb isin stays as defense in depth and is what the
    // PartitionFilters plan assertions pin.
    val rootPath = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val pbNames = pbs.map(p => s"pb=$p").toSet
    val top = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
    val isGenLayout = top.exists(_.startsWith("gen="))
    require(asOfGen.isEmpty || isGenLayout || top.isEmpty,
      s"index at $path has the flat one-shot layout — as-of serving " +
        "needs the generation forest an incremental consolidation lays out")
    val GenName = "gen=(\\d+)".r
    // A dir is in-snapshot iff ANY of its SOURCE generations is — its
    // `_gens` marker survives rebase folds, so a folded base dir still
    // serves snapshots older than the fold point (rows then filter by
    // the src_gen data column). Latest probes take every dir.
    val leafDirs: Seq[String] =
      if (isGenLayout)
        top.collect { case g @ GenName(id) => (id.toLong, g) }
          .filter { case (id, g) =>
            asOfGen.forall(a => graft.streaming.GenForest.readGensMarker(
              fs, new org.apache.hadoop.fs.Path(rootPath, g), id)
              .keys.exists(_ <= a))
          }
          .flatMap { case (_, g) =>
            fs.listStatus(new org.apache.hadoop.fs.Path(rootPath, g)).toSeq
              .map(_.getPath.getName).filter(pbNames.contains)
              .map(pb => s"$path/postings/$g/$pb")
          }
      else top.filter(pbNames.contains).map(pb => s"$path/postings/$pb")
    val scanned0 = (if (leafDirs.isEmpty)
        Seq.empty[(Long, String, Long, Long, Long)]
          .toDF("doc_id", "tok", "tf", "dl", "src_gen")
      else if (isGenLayout) {
        // the layout schema is declared (no inference job — guide §1:
        // schema inference is a one-task Spark job per read); the loud
        // pre-r16 guard inference used to provide moves to a
        // driver-side footer probe (no job, same single-file evidence
        // the old union-schema check effectively read)
        require(graft.streaming.StoreSchemas.footerHasField(fs,
            spark.sessionState.newHadoopConf(), rootPath, "src_gen")
            .getOrElse(true),
          s"index at $path has a gen= forest without the src_gen row " +
            "column — it was consolidated by a pre-r16 graft revision " +
            "whose rebase folds lose source-generation identity; " +
            "rebuild the index (re-consolidate from the hot store)")
        spark.read.option("basePath", s"$path/postings")
          .schema(graft.streaming.StoreSchemas.postingsForest)
          .parquet(leafDirs: _*)
          .filter(col("pb").isin(pbs: _*))
          .join(broadcast(tokDf), Seq("tok"))
          .select("doc_id", "tok", "tf", "dl", "src_gen")
      } else {
        // flat one-shot layouts have no src_gen (and reject as-of)
        spark.read.option("basePath", s"$path/postings")
          .schema(graft.streaming.StoreSchemas.postingsFlat)
          .parquet(leafDirs: _*)
          .filter(col("pb").isin(pbs: _*))
          .join(broadcast(tokDf), Seq("tok"))
          .select(col("doc_id"), col("tok"), col("tf"), col("dl"),
            lit(null).cast("long").as("src_gen"))
      })
    val scanned = asOfGen.map(a => scanned0.filter(col("src_gen") <= a))
      .getOrElse(scanned0)
    // Takedowns ([[graft.streaming.PostingsIngest.tombstoneDocs]]) are
    // ZERO-DRIFT at serve time: deleted docs are (1) hidden from the
    // hits, (2) subtracted from each query term's df — the dead hits
    // are already in this probe's own pre-anti-join scan, so the
    // correction costs no extra read — and (3) subtracted from
    // (n, sumdl) via the dl each tombstone batch recorded at commit
    // time. Every serve is bit-equal to a one-shot BM25 over the
    // surviving corpus (spec-pinned). Corrections RETIRE via the
    // cutoff each sidecar row carries (`purged_through`): a tombstone
    // corrects a doc iff its batch postdates the cutoff of the doc's
    // src gen, so whichever sidecar version a reader catches mid-
    // purge, content + corrections always compose to the purged
    // answer — the maintenance window cannot serve a mixed state.
    // snapshot ∪ tail with `batch_id` preserved as a DATA column
    // (r19): after a maintain's fold, the raw `tombstones/` dir read
    // would miss folded batches' correction rows — the snapshot keeps
    // them, so tb/dl/gen below compute bit-identically either side of
    // a fold. None = no takedown has ever landed.
    lazy val tombRows =
      graft.streaming.TombstoneStore.readRows(spark, path)
    if (isGenLayout) {
      // SIDECARS, per src gen: stats rows (gen, n, sumdl,
      // purged_through) and dict deltas (gen, tok, df, purged_through)
      // — both folds scoped by gen <= asOf, so latest and as-of serve
      // through ONE code path. A data-bearing forest with an empty
      // sidecar is a crashed purge awaiting its retry: serving would
      // be silently wrong (zero stats), so refuse loudly instead
      // (r15 ADVICE).
      val forestHasData =
        graft.streaming.GenForest.hasDataFiles(fs, rootPath)
      require(!forestHasData ||
        (graft.streaming.GenForest.hasDataFiles(fsStats, statsRoot) &&
          graft.streaming.GenForest.hasDataFiles(fsStats, dictRoot)),
        s"index at $path has postings data but empty stats/dict " +
          "sidecars — a purging rebase crashed mid-rebuild; re-run " +
          "PostingsIngest.rebase to settle it (its reconcile pass " +
          "rebuilds every missing sidecar generation)")
      // sidecar-compaction horizon (resolved in the single listing
      // above): src gens <= horizon live in ONE base sidecar bucket
      // keyed at the horizon (-1 = identity). History below it was
      // summed away, so snapshots there are REFUSED rather than
      // served wrong.
      require(asOfGen.forall(_ >= horizon),
        s"index at $path compacted its sidecar history up to " +
          s"gen=$horizon (PostingsIngest.compactSidecars) — an asOf " +
          s"older than that (${asOfGen.get}) has no per-generation " +
          "deltas left to serve from")
      def toBucket(c: Column): Column =
        when(c <= horizon, lit(horizon)).otherwise(c)
      val statsRows =
        if (!forestHasData) Seq.empty[(Long, Long, Long, Long)]
          .toDF("gen", "n", "sumdl", "purged_through")
        else spark.read.schema(graft.streaming.StoreSchemas.sidecarStats)
          .parquet(statsRoot.toString)
          .filter(asOfGen.map(a => col("gen") <= a).getOrElse(lit(true)))
          .select(col("gen").cast("long").as("gen"), col("n"),
            col("sumdl"), col("purged_through"))
      val dictRows =
        if (!forestHasData) Seq.empty[(Long, String, Long, Long)]
          .toDF("gen", "tok", "df", "purged_through")
        else spark.read.schema(graft.streaming.StoreSchemas.sidecarDict)
          .parquet(dictRoot.toString)
          .join(broadcast(tokDf), Seq("tok"))
          .filter(asOfGen.map(a => col("gen") <= a).getOrElse(lit(true)))
          .select(col("gen").cast("long").as("gen"), col("tok"),
            col("df"), col("purged_through"))
      val statsBase = statsRows
        .agg(coalesce(sum("n"), lit(0L)).cast("long").as("n"),
          coalesce(sum("sumdl"), lit(0L)).cast("long").as("sumdl"))
      val dfBase = dictRows.groupBy("tok").agg(sum("df").as("df"))
      val (hits, dfT, statsServe) =
        if (tombRows.isEmpty)
          (scanned.drop("src_gen"), dfBase, statsBase)
        else {
          val tombAll = tombRows.get
          val tombIds = tombAll.select("doc_id").distinct()
          val alive = scanned
            .join(broadcast(tombIds), Seq("doc_id"), "left_anti")
            .drop("src_gen")
          // one correction row per dead doc: tb = its FIRST takedown
          // batch (corrections apply iff tb postdates its gen's
          // cutoff); dl/gen recorded at commit time, max over
          // non-null readings is exact (properties of the doc). A
          // NULL gen means the doc never entered the forest (encode
          // skipped it) — nothing to correct.
          val tombMeta = tombAll.filter(col("dl").isNotNull)
            .groupBy("doc_id")
            .agg(min("batch_id").as("tb"), max("dl").as("dl"),
              max("gen").as("tgen"))
          // df: dead hits still physically present, not yet reflected
          // in their gen's dict cutoff — the dict row for (bucket,
          // tok) exists whenever a dead hit does (the doc posted the
          // tok, and its gen's delta lives in that bucket)
          val deadDf = scanned
            .withColumn("src_gen", toBucket(col("src_gen")))
            .join(broadcast(tombMeta.select(col("doc_id"), col("tb"))),
              Seq("doc_id"))
            .join(broadcast(dictRows.select(col("gen").as("src_gen"),
              col("tok"), col("purged_through"))), Seq("src_gen", "tok"))
            .filter(col("tb") > col("purged_through"))
            .groupBy("tok").agg(count(lit(1)).as("__df_dead"))
          val dfCorrected = dfBase
            .join(broadcast(deadDf), Seq("tok"), "left")
            .select(col("tok"),
              (col("df") - coalesce(col("__df_dead"), lit(0L))).as("df"))
          val cutoffs = statsRows
            .select(col("gen").as("tgen"), col("purged_through"))
          val corr = tombMeta
            .filter(col("tgen").isNotNull)
            .filter(asOfGen.map(a => col("tgen") <= a).getOrElse(lit(true)))
            .withColumn("tgen", toBucket(col("tgen")))
            .join(broadcast(cutoffs), Seq("tgen"))
            .filter(col("tb") > col("purged_through"))
            .agg(count(lit(1)).cast("long").as("__n_dead"),
              coalesce(sum("dl"), lit(0L)).cast("long").as("__dl_dead"))
          val statsCorrected = statsBase
            .crossJoin(broadcast(corr))
            .select((col("n") - col("__n_dead")).cast("long").as("n"),
              (col("sumdl") - col("__dl_dead")).cast("long").as("sumdl"))
          (alive, dfCorrected, statsCorrected)
        }
      Retrieval.bm25Rank(hits, dfT, qterms, statsServe, k, maxDf)
    } else {
      // FLAT one-shot layout: single cumulative dict + one-row stats;
      // takedowns correct df from the probe's own dead hits and stats
      // from the recorded dl rows, cut off by the global `_purged`
      // stamp (no generations to key a finer cutoff by)
      val statsBase: DataFrame =
        if (top.isEmpty) Seq((0L, 0L)).toDF("n", "sumdl")
        else spark.read.schema(graft.streaming.StoreSchemas.flatStats)
          .parquet(s"$path/stats").drop("pb_mod")
      val (hits, dfT, statsServe) =
        // an EMPTY forest root (total takedown, or consolidated-but-
        // all-idle) has nothing to hit and possibly no readable dict —
        // corrections are moot when the hit set is empty by layout
        if (tombRows.isEmpty || top.isEmpty) {
          val df0 =
            if (top.isEmpty) Seq.empty[(String, Long)].toDF("tok", "df")
            else spark.read.schema(graft.streaming.StoreSchemas.flatDict)
              .parquet(s"$path/dict")
              .join(broadcast(tokDf), Seq("tok"))
          (scanned.drop("src_gen"), df0, statsBase)
        } else {
          val tombAll = tombRows.get
          val tombIds = tombAll.select("doc_id").distinct()
          val alive = scanned
            .join(broadcast(tombIds), Seq("doc_id"), "left_anti")
            .drop("src_gen")
          val deadDf = scanned
            .join(broadcast(tombIds), Seq("doc_id"), "left_semi")
            .groupBy("tok").agg(count(lit(1)).as("__df_dead"))
          val dfCorrected = spark.read
            .schema(graft.streaming.StoreSchemas.flatDict)
            .parquet(s"$path/dict")
            .join(broadcast(tokDf), Seq("tok"))
            .join(broadcast(deadDf), Seq("tok"), "left")
            .select(col("tok"),
              (col("df") - coalesce(col("__df_dead"), lit(0L))).as("df"))
          val purged = graft.core.Markers.read(fs,
            new org.apache.hadoop.fs.Path(s"$path/_purged")).map(_.toLong)
            .getOrElse(-1L)
          val corr = tombAll
            .filter(col("batch_id") > purged && col("dl").isNotNull)
            .groupBy("doc_id").agg(max("dl").as("dl"))
            .agg(count(lit(1)).cast("long").as("__n_dead"),
              coalesce(sum("dl"), lit(0L)).cast("long").as("__dl_dead"))
          val statsCorrected = statsBase
            .crossJoin(broadcast(corr))
            .select((col("n") - col("__n_dead")).cast("long").as("n"),
              (col("sumdl") - col("__dl_dead")).cast("long").as("sumdl"))
          (alive, dfCorrected, statsCorrected)
        }
      Retrieval.bm25Rank(hits, dfT, qterms, statsServe, k, maxDf)
    }
  }
}
