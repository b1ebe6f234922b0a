package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity
import graft.streaming.AnnIngest

/** Property-based invariant for the growing IVFADC store — the
  * random-schedule sweep that completes the grown-store triad
  * (PostingsIngestProps, DedupIngestProps, and now the ANN twin; the
  * example-based AnnIngestSpec pins each window once, this sweeps the
  * shapes BETWEEN them): on RANDOM batch splits under EITHER
  * consolidation schedule, with a takedown batch committed at a
  * RANDOM point, an optional lost-watermark crash retry, and an
  * optional purging rebase,
  *
  *   1. the codes forest minus tombstoned rows equals the one-shot
  *      encode of the alive corpus against the frozen quantizer
  *      (encode is per-row deterministic, so no row is lost,
  *      duplicated, or re-encoded against different geometry);
  *   2. an as-of probe pinned to a RANDOM intermediate watermark
  *      scopes rows to src_gen <= the watermark while STILL hiding
  *      every tombstoned row (a takedown overrides snapshots) —
  *      including after a rebase folded the probed gens away;
  *   3. the leaf-dir-pruned serve path returns exactly the generic
  *      IVFADC search over the same surviving content;
  *   4. the watermark lands on the last batch.
  *
  * Trials are capped at 10: each builds a store, trains a quantizer,
  * and runs two searches plus two ground-truth encodes. */
object AnnIngestProps extends Properties("graft.annstore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(10, 3))

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private val NVecs = 48
  private val Dim = 8

  /** Deterministic tiny corpus: sin-wave embeddings (all nonzero
    * norm, no two identical). */
  private lazy val vecs = spark.range(NVecs).select(
    col("id").as("vec_id"),
    expr(s"transform(sequence(0, ${Dim - 1}), " +
      "i -> cast(sin(id * 13 + i * 7) as float))").as("embedding"))

  /** One-shot encode against the frozen quantizer — the ground truth
    * every grown forest must match row-for-row (the AnnIngestSpec
    * helper, shared shape). */
  private def encodeOneShot(sel: org.apache.spark.sql.DataFrame,
      centroids: Seq[(Long, Seq[Float])],
      books: Seq[Seq[Seq[Float]]]): Set[(Long, Long, Seq[Int])] = {
    if (sel.isEmpty) return Set.empty
    val assigned = Similarity.assignCells(
      sel.select(col("vec_id"), col("embedding")), centroids)
    val resid = Similarity.residualFrame(sel, assigned, centroids)
    Similarity.pqEncode(resid, books)
      .join(assigned, Seq("vec_id"))
      .select("vec_id", "cell", "codes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq))
      .toSet
  }

  private def forestRows(idx: String): Seq[(Long, Long, Seq[Int], Long)] =
    spark.read.parquet(s"$idx/index")
      .select(col("vec_id"), col("cell").cast("long"), col("codes"),
        col("src_gen").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq,
        r.getLong(3)))
      .toSeq

  private val schedGen: Gen[(Int, List[Int], Boolean, Int, Boolean, Seq[Int], Int, Boolean, Int)] =
    for {
      nB <- Gen.chooseNum(1, 4)
      assign0 <- Gen.listOfN(NVecs, Gen.chooseNum(0, nB - 1))
      consolidateEach <- Gen.oneOf(true, false)
      asOfAt <- Gen.chooseNum(0, nB - 1)
      doRebase <- Gen.oneOf(true, false)
      nDead <- Gen.chooseNum(0, 6)
      dead <- Gen.pick(nDead, 0 until NVecs)
      // the takedown batch commits after the tombAt-th ingest step
      // (0 = before anything, nB = after everything)
      tombAt <- Gen.chooseNum(0, nB)
      dropWm <- Gen.oneOf(true, false)
      // the watermark is lost after the dropWmAt-th batch's gen is
      // installed, while LATER batches are still pending — the real
      // crash state (r17 ADVICE: the old shape dropped it after the
      // final consolidate, when the floor guard's skip was vacuous)
      dropWmAt <- Gen.chooseNum(0, nB - 1)
    } yield (nB, assign0, consolidateEach, asOfAt, doRebase,
      dead.toSeq.sorted, tombAt, dropWm, dropWmAt)

  property("any split + schedule + takedown + crash retry serves the " +
      "one-shot encode, snapshots scope by src_gen but never resurrect") =
    forAll(schedGen) {
      case (nB, assign0, consolidateEach, asOfAt, doRebase, dead,
          tombAt, dropWm, dropWmAt) =>
      // the default (uncapped) training seed rule needs vec_ids below
      // nCentroids in the training set; vec 0 is pinned to batch 0 so
      // a consolidate-each schedule (which trains on batch 0 alone)
      // always has a seed — the thin-seed shape itself stays random
      val assign = assign0.updated(0, 0)
      val base = Files.createTempDirectory("ann-prop").toString
      val store = s"$base/store"
      val idx = s"$base/idx"
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
      def consolidate(): Unit = AnnIngest.consolidate(spark, store, idx,
        nCentroids = 4, ivfIters = 1, m = 4, ksub = 8, pqIters = 1,
        dim = Dim)
      def maybeTomb(after: Int): Unit =
        if (after == tombAt && dead.nonEmpty)
          AnnIngest.tombstone(
            vecs.filter(col("vec_id").isin(dead.map(i => Long.box(i.toLong)): _*))
              .select("vec_id"), 0L, idx)
      // the crash this sweeps: a consolidation that installed its gen
      // and then died before (or just after) the watermark write, with
      // LATER batches still arriving — the retry's floor guard must
      // re-derive the floor from the installed gens (skip them) while
      // genuinely encoding the pending batches. Only meaningful with a
      // batch pending after the drop point.
      val dropAt = if (dropWm && nB >= 2) Some(math.min(dropWmAt, nB - 2)) else None
      maybeTomb(0)
      for (b <- 0 until nB) {
        val ids = assign.zipWithIndex.collect { case (`b`, v) => v.toLong }
        val batch =
          if (ids.isEmpty) vecs.filter(lit(false))
          else vecs.filter(col("vec_id").isin(ids.map(Long.box): _*))
        AnnIngest.ingestBatch(batch, b.toLong, store)
        if (consolidateEach) consolidate()
        maybeTomb(b + 1)
        if (dropAt.contains(b)) {
          if (!consolidateEach) consolidate() // install a gen covering <= b
          fs.delete(new org.apache.hadoop.fs.Path(idxPath, "_through"), false)
        }
      }
      if (!consolidateEach) consolidate()
      if (doRebase) AnnIngest.rebase(spark, idx)

      val (centroids, books) = AnnIngest.loadQuantizer(spark, idx)
      val deadSet = dead.map(_.toLong).toSet
      val alive = vecs.filter(!col("vec_id").isin(dead.map(i => Long.box(i.toLong)): _*))
      val rows = forestRows(idx)

      // 1. content: the forest minus tombstoned rows IS the one-shot
      // encode of the alive corpus (pre-rebase the forest may still
      // hold rows encoded before the takedown committed; the serve
      // path hides them, the rebase purges them)
      val contentOk = rows.collect {
        case (v, c, k, _) if !deadSet.contains(v) => (v, c, k)
      }.toSet == encodeOneShot(alive, centroids, books)
      // ... and as a MULTISET: every vec_id appears in exactly one
      // forest row, so a row duplicated across two generations
      // (identical vec/cell/codes under the frozen quantizer,
      // differing only in src_gen) cannot hide in the Set compare —
      // the blindness the r17 ADVICE called out. Checked over ALL
      // rows: a crash-retried consolidate or a rebase fold must not
      // duplicate dead rows either.
      val noDupOk = rows.map(_._1).distinct.size == rows.size
      // ... and a purging rebase leaves NO dead row on disk
      val purgedOk = !doRebase || dead.isEmpty ||
        !rows.exists { case (v, _, _, _) => deadSet.contains(v) }

      // 2. as-of content: rows scoped to src_gen <= the probed
      // watermark, minus tombstones, equal the one-shot encode of the
      // alive prefix — exact across the rebase fold (src_gen is a
      // data column the fold preserves)
      val asOfOk = !consolidateEach || {
        val prefixIds = assign.zipWithIndex.collect {
          case (b, v) if b <= asOfAt && !deadSet.contains(v.toLong) =>
            v.toLong
        }
        val prefix =
          if (prefixIds.isEmpty) vecs.filter(lit(false))
          else vecs.filter(col("vec_id").isin(prefixIds.map(Long.box): _*))
        rows.collect {
          case (v, c, k, g) if g <= asOfAt && !deadSet.contains(v) =>
            (v, c, k)
        }.toSet == encodeOneShot(prefix, centroids, books)
      }

      // 3. serve: the leaf-dir-pruned path equals the generic IVFADC
      // search over the same surviving content
      val grown = AnnIngest.searchGrown(vecs, spark, idx,
          nQueries = 3, k = 4)
        .orderBy("query_id", "rank").collect().toSeq.map(_.toString)
      val idxDf = spark.read.parquet(s"$idx/index")
        .select("vec_id", "cell", "codes")
        .filter(!col("vec_id").isin(dead.map(i => Long.box(i.toLong)): _*))
      val generic = Similarity.ivfPqSearch(vecs, idxDf, centroids, books,
          nQueries = 3, k = 4)
        .orderBy("query_id", "rank").collect().toSeq.map(_.toString)

      contentOk && noDupOk && purgedOk && asOfOk && grown == generic &&
        AnnIngest.consolidatedThrough(spark, idx).contains((nB - 1).toLong)
    }
}
