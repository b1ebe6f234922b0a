package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{IndexStore, Retrieval}
import graft.streaming.PostingsIngest

/** Property-based invariant for the growing BM25 store: on RANDOM
  * batch splits of a corpus (any batch count, any doc→batch
  * assignment including empty batches) under EITHER consolidation
  * schedule (after every batch = a gen per batch, or once at the end
  * = one gen), the served index is row-identical to the one-shot
  * inline query and the watermark lands on the last batch — the
  * split-shape sweep the example-based PostingsIngestSpec cases
  * cannot cover. Trials are capped at 10: each one builds a store,
  * consolidates, and runs two full searches. */
object PostingsIngestProps extends Properties("graft.postings") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(10, 3))

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private val NDocs = 60

  /** Deterministic tiny corpus: 12-token docs over a 30-word
    * vocabulary — enough collisions for real posting lists. */
  private lazy val docs = spark.range(NDocs).select(
    col("id").as("doc_id"),
    expr("concat_ws(' ', transform(sequence(0, 11), " +
      "i -> concat('w', pmod(id * 7 + i * 5, 30))))").as("text"))

  private val splitGen: Gen[(Int, List[Int], Boolean, Int, Boolean, Boolean, Int, Int)] =
    for {
      nB <- Gen.chooseNum(1, 5)
      assign <- Gen.listOfN(NDocs, Gen.chooseNum(0, nB - 1))
      consolidateEach <- Gen.oneOf(true, false)
      asOfAt <- Gen.chooseNum(0, nB - 1)
      doRebase <- Gen.oneOf(true, false)
      doCompact <- Gen.oneOf(true, false)
      keepLast <- Gen.chooseNum(0, 2)
      // 0 = clean run; 1 = die after the horizon stamp; 2 = die after
      // the stamp AND the stats fold (the r16 ADVICE corruption window)
      crashAt <- Gen.chooseNum(0, 2)
    } yield (nB, assign, consolidateEach, asOfAt, doRebase, doCompact,
      keepLast, crashAt)

  property("any split + any consolidation schedule serves the one-shot answer") =
    forAll(splitGen) {
      case (nB, assign, consolidateEach, asOfAt, doRebase, doCompact,
          keepLast, crashAt) =>
      val base = Files.createTempDirectory("postings-prop").toString
      val store = s"$base/store"
      val idx = s"$base/idx"
      for (b <- 0 until nB) {
        val ids = assign.zipWithIndex.collect { case (`b`, d) => d.toLong }
        val batch =
          if (ids.isEmpty) docs.filter(lit(false))
          else docs.filter(col("doc_id").isin(ids.map(Long.box): _*))
        PostingsIngest.ingestBatch(batch, b.toLong, store)
        if (consolidateEach)
          PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
      }
      if (!consolidateEach)
        PostingsIngest.consolidate(spark, store, idx, pbMod = 8)
      // a random major compaction anywhere in the life of the index
      // must be invisible to BOTH the latest read and every snapshot
      // (r16: src_gen rows + per-src-gen sidecars survive the fold)
      if (doRebase) PostingsIngest.rebase(spark, idx)
      // sidecar compaction must be invisible to the latest read, and
      // snapshots split cleanly at its stamped horizon: at-or-after
      // serve exactly, before REFUSE loudly (never a wrong answer).
      // With crashAt != 0 the run first DIES at a random phase of a
      // keepLast=0 compaction (the stamp is the commit point, so the
      // stamped horizon governs from that moment) and the retry —
      // possibly under a DIFFERENT keepLast — must heal to the exact
      // same invariants: no double count, no lost gen, refusal only
      // below the stamped horizon.
      if (doCompact) {
        if (crashAt > 0) {
          val idxPath = new org.apache.hadoop.fs.Path(idx)
          val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
          val gens = fs.listStatus(new org.apache.hadoop.fs.Path(
              PostingsIngest.sidecarRootPath(spark, idx, "dict")))
            .map(_.getPath.getName).collect { case s if s.startsWith("gen=") =>
              s.stripPrefix("gen=").toLong }
          if (gens.length > 1) {
            PostingsIngest.stampSidecarHorizon(fs, idxPath, gens.max)
            if (crashAt == 2)
              PostingsIngest.foldSidecarTo(spark, idxPath, fs, "stats", gens.max)
          }
        }
        PostingsIngest.compactSidecars(spark, idx, keepLast = keepLast)
      }
      val horizon = PostingsIngest.sidecarHorizon(spark, idx)
      val served = IndexStore.bm25FromIndex(docs, spark, idx,
          nQueries = 4, qLen = 3, k = 5)
        .orderBy("q_id", "rank").collect().toSeq.map(_.toString)
      val oneShot = Retrieval.bm25TopK(docs, nQueries = 4, qLen = 3, k = 5)
        .orderBy("q_id", "rank").collect().toSeq.map(_.toString)
      // per-gen layouts also owe snapshot correctness: an as-of probe
      // pinned to a RANDOM intermediate watermark must equal a
      // one-shot over exactly the docs ingested by then — including
      // empty-prefix (no gens yet) and empty-batch watermarks, and
      // including AFTER a rebase folded the probed gens away
      val asOfOk = !consolidateEach || {
        val prefixIds = assign.zipWithIndex
          .collect { case (b, d) if b <= asOfAt => d.toLong }
        val prefix =
          if (prefixIds.isEmpty) docs.filter(lit(false))
          else docs.filter(col("doc_id").isin(prefixIds.map(Long.box): _*))
        def snap() = IndexStore.bm25FromIndex(prefix, spark, idx,
            nQueries = 4, qLen = 3, k = 5, asOfGen = Some(asOfAt.toLong))
          .orderBy("q_id", "rank").collect().toSeq.map(_.toString)
        if (asOfAt < horizon)
          try { snap(); false } // must refuse, not serve
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("compacted") }
        else {
          val snapOneShot = Retrieval.bm25TopK(prefix,
              nQueries = 4, qLen = 3, k = 5)
            .orderBy("q_id", "rank").collect().toSeq.map(_.toString)
          snap() == snapOneShot
        }
      }
      served == oneShot && asOfOk &&
        PostingsIngest.consolidatedThrough(spark, idx).contains((nB - 1).toLong)
    }
}
