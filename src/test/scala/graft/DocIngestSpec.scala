package graft

import graft.streaming.DocIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Growing-index streaming ingest: cross-batch near-dup pairs emerge
  * as batches arrive, stores accumulate one batch_id partition per
  * micro-batch, and a replayed batch is a true no-op (no self-pairs,
  * no duplicate docs). */
class DocIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " o1 o2"
  private val nearDup2 = (1 to 37).map(i => s"tok$i").mkString(" ") + " p1 p2 p3"
  private val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")

  test("ingest accumulates the index; later batches match all earlier batches; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("ingest")
    val (docsP, idxP, pairsP) = (s"$root/docs", s"$root/index", s"$root/pairs")
    val input = MemoryStream[(Long, String)]
    val q = DocIngest.start(input.toDF().toDF("doc_id", "text"),
      docsP, idxP, pairsP, tmp("ingest-ckpt"))
    try {
      input.addData((1L, base), (2L, unrelated))
      q.processAllAvailable() // batch 0: empty stores, no pairs possible
      input.addData((3L, nearDup))
      q.processAllAvailable() // batch 1: 3 matches 1
      input.addData((4L, nearDup2))
      q.processAllAvailable() // batch 2: 4 matches 1 AND 3 (two prior batches)
      val pairs = spark.read.parquet(pairsP)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(pairs == Set((3L, 1L), (4L, 1L), (4L, 3L)),
        s"cross-batch near-dups against the accumulated index, got $pairs")
      val docs = spark.read.parquet(docsP)
      assert(docs.count() == 4 &&
        docs.select("batch_id").distinct().count() == 3)
      assert(spark.read.parquet(idxP).select("doc_id").distinct().count() == 4)
    } finally q.stop()

    // at-least-once replay: re-run the LAST committed batch with the
    // same batchId — its reads must exclude its own partition (no
    // self-pairs at jaccard 1.0) and its writes must only overwrite
    // its own partition (store contents unchanged)
    val before = spark.read.parquet(pairsP)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    DocIngest.ingestBatch(Seq((4L, nearDup2)).toDF("doc_id", "text"),
      2L, docsP, idxP, pairsP, 0.5)
    val after = spark.read.parquet(pairsP)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(after == before, "replayed batch must not add or change pairs")
    assert(!after.exists(p => p._1 == p._2), "no self-pairs on replay")
    assert(spark.read.parquet(docsP).count() == 4,
      "replayed docs overwrite their own partition only")
  }

  test("compactStores folds committed batches and the resumed stream matches over the segment") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("ingest3")
    val (docsP, idxP, pairsP, ckpt) =
      (s"$root/docs", s"$root/index", s"$root/pairs", s"$root/ckpt")
    // one MemoryStream across both query incarnations — its offsets
    // must outlive the query for the checkpointed restart
    val input = MemoryStream[(Long, String)]
    def stream() = DocIngest.start(input.toDF().toDF("doc_id", "text"),
      docsP, idxP, pairsP, ckpt)
    val q1 = stream()
    try {
      input.addData((1L, base), (2L, unrelated)); q1.processAllAvailable()
      input.addData((3L, nearDup)); q1.processAllAvailable()
    } finally q1.stop()

    val stats = DocIngest.compactStores(spark, docsP, idxP, pairsP, ckpt)
    assert(stats("docs").get.batchesMerged == 2)
    assert(stats("index").get.batchesMerged == 2)
    assert(spark.read.parquet(docsP).count() == 3)

    val q2 = stream()
    try {
      input.addData((4L, nearDup2)); q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(pairsP)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 1L), (4L, 1L), (4L, 3L)),
      s"resumed batch must match against the compacted band index, got $pairs")
    assert(spark.read.parquet(docsP).count() == 4, "no duplicated docs")
  }

  test("first-ever batch writes an empty pairs partition without failing") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("ingest2")
    DocIngest.ingestBatch(Seq((1L, base)).toDF("doc_id", "text"),
      0L, s"$root/docs", s"$root/index", s"$root/pairs", 0.5)
    assert(spark.read.parquet(s"$root/docs").count() == 1)
    assert(spark.read.parquet(s"$root/index").count() > 0)
  }
}
