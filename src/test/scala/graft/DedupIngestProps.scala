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
    p.withMinSuccessfulTests(8)

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

  private val caseGen: Gen[(Int, List[Int], Boolean, Int, Boolean, Boolean)] = for {
    nB <- Gen.chooseNum(1, 4)
    assign <- Gen.listOfN(NCorpus, Gen.chooseNum(0, nB - 1))
    consolidateEach <- Gen.oneOf(true, false)
    victim <- Gen.chooseNum(0, NCorpus - 1)
    doRebase <- Gen.oneOf(true, false)
    dropWm <- Gen.oneOf(true, false)
  } yield (nB, assign, consolidateEach, victim, doRebase, dropWm)

  property("any split + schedule + takedown serves the inline answer " +
      "over survivors") =
    forAll(caseGen) { case (nB, assign, consolidateEach, victim,
        doRebase, dropWm) =>
      val base = Files.createTempDirectory("dedup-prop").toString
      val store = s"$base/store"
      val idx = s"$base/idx"
      for (b <- 0 until nB) {
        val ids = assign.zipWithIndex.collect { case (`b`, d) => d.toLong }
        val batch =
          if (ids.isEmpty) corpus.filter(lit(false))
          else corpus.filter(col("doc_id").isin(ids.map(Long.box): _*))
        DedupIngest.ingestBatch(batch, b.toLong, store)
        if (consolidateEach) DedupIngest.consolidate(spark, store, idx)
      }
      if (!consolidateEach) DedupIngest.consolidate(spark, store, idx)
      import spark.implicits._
      if (dropWm) {
        // crash window: watermark lost after the last gen install —
        // the floor guard must re-derive it from the installed gens
        // and re-index nothing on the retry
        val idxPath = new org.apache.hadoop.fs.Path(idx)
        idxPath.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(new org.apache.hadoop.fs.Path(idxPath, "_through"), false)
        DedupIngest.consolidate(spark, store, idx)
      }
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
      shapesAgree && got == fullPairs.filterNot(_._2 == victim.toLong)
    }
}
