package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup
import graft.streaming.DedupIngest

/** Property-based invariant for the growing band store: on RANDOM
  * batch splits of a corpus (any batch count, any doc→batch
  * assignment including empty batches) under EITHER consolidation
  * schedule, with a RANDOM takedown committed after consolidation,
  * the probe's pairs equal the inline incremental flow over the
  * surviving corpus. Pairwise independence makes the expectation
  * computable once: removing one corpus doc deletes exactly its own
  * pairs and no others. */
object DedupIngestProps extends Properties("graft.dedupstore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(8, 3))

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private val NCorpus = 60

  /** 60 corpus docs over 30 text patterns — ids i and i+30 are exact
    * duplicates, so every probe doc has two true matches. */
  private lazy val corpus = spark.range(NCorpus).select(
    col("id").as("doc_id"),
    expr("concat_ws(' ', transform(sequence(0, 11), " +
      "i -> concat('w', pmod((id % 30) * 7 + i * 5, 40))))").as("text"))

  /** 5 probe docs repeating patterns 0-4. */
  private lazy val newDocs = spark.range(5).select(
    (col("id") + 1000L).as("doc_id"),
    expr("concat_ws(' ', transform(sequence(0, 11), " +
      "i -> concat('w', pmod(id * 7 + i * 5, 40))))").as("text"))

  private lazy val fullPairs: Set[(Long, Long)] =
    Dedup.minhashLshIncremental(newDocs, corpus, 0.5)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val caseGen: Gen[(Int, List[Int], Boolean, Int, Boolean, Boolean, Int)] = for {
    nB <- Gen.chooseNum(1, 4)
    assign <- Gen.listOfN(NCorpus, Gen.chooseNum(0, nB - 1))
    consolidateEach <- Gen.oneOf(true, false)
    victim <- Gen.chooseNum(0, NCorpus - 1)
    doRebase <- Gen.oneOf(true, false)
    dropWm <- Gen.oneOf(true, false)
    // the watermark is lost after the dropWmAt-th batch's gen is
    // installed, while LATER batches are still pending (r17 ADVICE:
    // the old shape dropped it after the final consolidate, when the
    // retry's floor-guard skip was vacuous — gen installed, stale
    // watermark, newer batches pending was never exercised)
    dropWmAt <- Gen.chooseNum(0, nB - 1)
  } yield (nB, assign, consolidateEach, victim, doRebase, dropWm, dropWmAt)

  property("any split + schedule + takedown serves the inline answer " +
      "over survivors") =
    forAll(caseGen) { case (nB, assign, consolidateEach, victim,
        doRebase, dropWm, dropWmAt) =>
      val base = Files.createTempDirectory("dedup-prop").toString
      val store = s"$base/store"
      val idx = s"$base/idx"
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
      // crash retry only meaningful with a batch pending after the drop
      val dropAt = if (dropWm && nB >= 2) Some(math.min(dropWmAt, nB - 2)) else None
      for (b <- 0 until nB) {
        val ids = assign.zipWithIndex.collect { case (`b`, d) => d.toLong }
        val batch =
          if (ids.isEmpty) corpus.filter(lit(false))
          else corpus.filter(col("doc_id").isin(ids.map(Long.box): _*))
        DedupIngest.ingestBatch(batch, b.toLong, store)
        if (consolidateEach) DedupIngest.consolidate(spark, store, idx)
        if (dropAt.contains(b)) {
          // crash window: a consolidation installed its gen and died
          // before the watermark write, with later batches still
          // arriving — the retry must re-derive the floor from the
          // installed gens (skip them, duplicating no band row) while
          // genuinely folding the batches that arrive after the crash
          if (!consolidateEach) DedupIngest.consolidate(spark, store, idx)
          fs.delete(new org.apache.hadoop.fs.Path(idxPath, "_through"), false)
        }
      }
      if (!consolidateEach) DedupIngest.consolidate(spark, store, idx)
      import spark.implicits._
      DedupIngest.tombstoneDocs(Seq(victim.toLong).toDF("doc_id"), 0L, idx)
      // a purging rebase (the takedown makes it lossy) folded anywhere
      // after the tombstone must be invisible to the probe
      if (doRebase) DedupIngest.rebase(spark, idx)
      val got = DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, 0.5)
        .select("new_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the adaptive probe's two scan shapes (whole-root vs enumerated
      // leaf dirs) must agree band-for-band on every random store shape
      val bands = graft.core.Materialize.pin(Dedup.minhashBands(newDocs))
      def bandSet(threshold: Long) =
        DedupIngest.corpusBandsFromIndex(spark, idx, bands,
            flatBelowSavedBytes = threshold)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val shapesAgree = bandSet(0L) == bandSet(Long.MaxValue)
      // multiset discipline: a crash-retried consolidate must not fold
      // the same batch twice — every (doc_id, band) appears in exactly
      // one forest row
      val forest = spark.read.parquet(s"$idx/bands")
        .select("doc_id", "band").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      val noDup = forest.distinct.size == forest.size
      shapesAgree && noDup && got == fullPairs.filterNot(_._2 == victim.toLong)
    }

  // ---- crash-at-random-phase maintenance (VERDICT r17 #3) --------------

  /** The band-store leg of the triad's crash sweep (PostingsIngestProps
    * sweeps the sidecar compaction phases, AnnIngestProps the
    * lost-watermark retry): a maintenance cycle that DIES at a random
    * phase — a dead run's consolidation claim left behind, a rebase
    * swap crashed between its two renames (roll-back shape), or after
    * its stamped build (roll-forward shape) — must (a) make the next
    * consolidate refuse LOUDLY where the contract says to, (b) heal
    * completely through the documented entry point, and (c) serve the
    * exact inline answer afterward, duplicating and losing nothing. */
  private val crashGen: Gen[(Int, List[Int], Int, Boolean, Int)] = for {
    nB <- Gen.chooseNum(2, 4)
    assign <- Gen.listOfN(NCorpus, Gen.chooseNum(0, nB - 1))
    victim <- Gen.chooseNum(0, NCorpus - 1)
    tombBeforeCrash <- Gen.oneOf(true, false)
    // 1 = stale consolidation claim; 2 = rebase crashed mid-swap
    // (forest in trash, scratch unstamped); 3 = rebase crashed after
    // its stamped scratch build (forest gone, scratch complete)
    crashAt <- Gen.chooseNum(1, 3)
  } yield (nB, assign, victim, tombBeforeCrash, crashAt)

  property("crash-at-random-phase maintenance refuses loudly, heals " +
      "from the documented entry point, serves the inline answer") =
    forAll(crashGen) { case (nB, assign, victim, tombBeforeCrash, crashAt) =>
      import spark.implicits._
      val base = Files.createTempDirectory("dedup-crash").toString
      val store = s"$base/store"
      val idx = s"$base/idx"
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
      // consolidate-each schedule for all but the LAST batch, which
      // stays pending through the crash: with nothing pending,
      // consolidate early-returns on `through <= prev` before it ever
      // looks at the claim or the recovery dirs, and every refusal
      // under test would be vacuous
      for (b <- 0 until nB) {
        val ids = assign.zipWithIndex.collect { case (`b`, d) => d.toLong }
        val batch =
          if (ids.isEmpty) corpus.filter(lit(false))
          else corpus.filter(col("doc_id").isin(ids.map(Long.box): _*))
        DedupIngest.ingestBatch(batch, b.toLong, store)
        if (b < nB - 1) DedupIngest.consolidate(spark, store, idx)
      }
      if (tombBeforeCrash)
        DedupIngest.tombstoneDocs(Seq(victim.toLong).toDF("doc_id"), 0L, idx)
      val bandsRoot = new org.apache.hadoop.fs.Path(idxPath, "bands")
      val scratch = new org.apache.hadoop.fs.Path(idxPath, ".rebase-scratch-bands")
      val trash = new org.apache.hadoop.fs.Path(idxPath, ".rebase-old-bands")
      val claim = new org.apache.hadoop.fs.Path(idxPath, "_consolidate_commit")
      val refused = crashAt match {
        case 1 =>
          // a dead run's claim marker: consolidate must throw the
          // in-flight message, and deleting the marker (its documented
          // remedy) must fully unblock the retry
          graft.core.Markers.forceWrite(fs, claim, "dead-run\n99")
          val msg = try { DedupIngest.consolidate(spark, store, idx); "" }
            catch { case e: IllegalStateException => e.getMessage }
          fs.delete(claim, false)
          msg.contains("in flight")
        case 2 =>
          // rebase died between its two swap renames: forest in trash,
          // scratch present but unstamped — consolidate must REFUSE
          // (a fresh gen would recreate the root and strand the real
          // forest), and rebase must roll BACK then settle
          require(fs.rename(bandsRoot, trash), "fabricating crash state")
          fs.mkdirs(scratch)
          val msg = try { DedupIngest.consolidate(spark, store, idx); "" }
            catch { case e: IllegalArgumentException => e.getMessage }
          DedupIngest.rebase(spark, idx)
          msg.contains("recovery state pending")
        case 3 =>
          // rebase died after its stamped scratch build, before the
          // forward rename: forest gone, scratch carries _complete —
          // the recovery prologue must roll it FORWARD
          require(fs.rename(bandsRoot, scratch), "fabricating crash state")
          graft.core.Markers.forceWrite(fs,
            new org.apache.hadoop.fs.Path(scratch, "_complete"),
            (nB - 1).toString)
          val msg = try { DedupIngest.consolidate(spark, store, idx); "" }
            catch { case e: IllegalArgumentException => e.getMessage }
          DedupIngest.rebase(spark, idx)
          msg.contains("recovery state pending")
      }
      if (!tombBeforeCrash)
        DedupIngest.tombstoneDocs(Seq(victim.toLong).toDF("doc_id"), 0L, idx)
      // whatever the crash was, one full maintenance pass afterward
      // (the blind-scheduler call) must leave a healthy store
      DedupIngest.maintain(spark, store, idx)
      val got = DedupIngest.dedupAgainstIndex(newDocs, corpus, spark, idx, 0.5)
        .select("new_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val forest = spark.read.parquet(s"$idx/bands")
        .select("doc_id", "band").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      val noDup = forest.distinct.size == forest.size
      refused && noDup &&
        got == fullPairs.filterNot(_._2 == victim.toLong) &&
        DedupIngest.consolidatedThrough(spark, idx).contains((nB - 1).toLong)
    }
}
