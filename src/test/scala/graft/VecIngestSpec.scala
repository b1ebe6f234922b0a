package graft

import graft.streaming.VecIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Growing-index streaming ingest for embeddings: cross-batch
  * near-dup pairs emerge as batches arrive through the accumulated
  * LSH bucket index, and a replayed batch is a true no-op. */
class VecIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  // deterministic directions: near-dups are tiny perturbations, the
  // unrelated vector is an independent direction
  private def vec(seed: Int, wobble: Float = 0f): Seq[Float] =
    Seq.tabulate(16)(d => math.sin(seed * 31 + d * 7).toFloat +
      (if (d == 0) wobble else 0f))

  test("vector ingest matches later batches against all earlier ones; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("vingest")
    val (vecsP, idxP, pairsP) = (s"$root/vecs", s"$root/index", s"$root/pairs")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = VecIngest.start(input.toDF().toDF("vec_id", "embedding"),
      vecsP, idxP, pairsP, tmp("vingest-ckpt"), minSim = 0.99)
    try {
      input.addData((1L, vec(1)), (2L, vec(99)))
      q.processAllAvailable() // batch 0: empty stores, no pairs possible
      input.addData((3L, vec(1, wobble = 0.01f)))
      q.processAllAvailable() // batch 1: 3 ~ 1
      input.addData((4L, vec(1, wobble = -0.01f)))
      q.processAllAvailable() // batch 2: 4 ~ 1 AND 4 ~ 3
      val pairs = spark.read.parquet(pairsP)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(pairs == Set((3L, 1L), (4L, 1L), (4L, 3L)),
        s"cross-batch near-dups against the accumulated index, got $pairs")
      val vecs = spark.read.parquet(vecsP)
      assert(vecs.count() == 4 &&
        vecs.select("batch_id").distinct().count() == 3)
      assert(spark.read.parquet(idxP).select("vec_id").distinct().count() == 4)
    } finally q.stop()

    // at-least-once replay with the same batchId: no self-pairs, no
    // duplicate vectors, pair store unchanged
    val before = spark.read.parquet(pairsP)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    VecIngest.ingestBatch(Seq((4L, vec(1, wobble = -0.01f)))
        .toDF("vec_id", "embedding"),
      2L, vecsP, idxP, pairsP, 0.99)
    val after = spark.read.parquet(pairsP)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(after == before, "replayed batch must not add or change pairs")
    assert(!after.exists(p => p._1 == p._2), "no self-pairs on replay")
    assert(spark.read.parquet(vecsP).count() == 4,
      "replayed vectors overwrite their own partition only")
  }

  test("16-plane ingest default holds candidate volume flat where 8 planes saturate") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    // 2000 independent corpus directions + a 50-vector probe batch:
    // candidate volume (the per-batch cost driver) is the bucket-join
    // row count BEFORE verification. At 8 planes random pairs collide
    // per table at ~2^-8 -> expected ~ 50*2000*8/256 candidates; at 16
    // planes ~ /65536 -> near zero. The assertions bound both. Vectors
    // are full-plane-width (64-dim) independent directions (seeded RNG
    // per vector — a shared-waveform fixture like sin(seed + c*d) puts
    // every vector in one 2-D subspace and floods every bucket).
    def vec64(seed: Long): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)(r.nextFloat() - 0.5f)
    }
    val corpus = (100L until 2100L).map(i => (i, vec64(i))).toDF("vec_id", "embedding")
    val batch = (1L to 50L).map(i => (i, vec64(-i * 977L))).toDF("vec_id", "embedding")
    def candidates(planes: Int): Long = {
      val cb = Similarity.lshBandIndex(corpus, planesPerTable = planes)
      val bb = Similarity.lshBandIndex(batch, planesPerTable = planes)
        .withColumnsRenamed(Map("vec_id" -> "new_id"))
      cb.join(bb, Seq("tbl", "bucket"))
        .select("new_id", "vec_id").distinct().count()
    }
    val at8 = candidates(8)
    val at16 = candidates(Similarity.IngestPlanesPerTable)
    assert(at16 * 10 < at8,
      s"16 planes must collapse false-candidate volume ($at16 vs $at8 at 8 planes)")
    assert(at16 < 200, s"near-zero false candidates at 16 planes (got $at16)")
    // sizing helper: 2^planes >= corpus, floored/capped
    assert(Similarity.planesForCorpus(100) == 8)
    assert(Similarity.planesForCorpus(60000) == 16)
    assert(Similarity.planesForCorpus(1L << 30) == 24)
  }

  test("plane-width marker: probing a store at a different width fails loudly") {
    val root = tmp("vingest3")
    val (vecsP, idxP, pairsP) = (s"$root/vecs", s"$root/index", s"$root/pairs")
    VecIngest.ingestBatch(Seq((1L, vec(1))).toDF("vec_id", "embedding"),
      0L, vecsP, idxP, pairsP, 0.99, planesPerTable = 8)
    // same width: fine (replay/continuation)
    VecIngest.ingestBatch(Seq((2L, vec(2))).toDF("vec_id", "embedding"),
      1L, vecsP, idxP, pairsP, 0.99, planesPerTable = 8)
    // different width (e.g. a default change): must not silently degrade
    val e = intercept[IllegalArgumentException] {
      VecIngest.ingestBatch(Seq((3L, vec(3))).toDF("vec_id", "embedding"),
        2L, vecsP, idxP, pairsP, 0.99, planesPerTable = 16)
    }
    assert(e.getMessage.contains("built with 8 planes"))
  }

  test("an existing store with NO width marker is refused, not blindly stamped") {
    // the r11 ADVICE scenario: a store built before width stamping (at
    // the then-default 8 planes) resumed under the 16-plane default —
    // stamping 16 onto it would make the silent-recall-loss guard
    // itself cause the loss. The marker-less store must fail loudly.
    val root = tmp("vingest4")
    val (vecsP, idxP, pairsP) = (s"$root/vecs", s"$root/index", s"$root/pairs")
    VecIngest.ingestBatch(Seq((1L, vec(1))).toDF("vec_id", "embedding"),
      0L, vecsP, idxP, pairsP, 0.99, planesPerTable = 8)
    // simulate the pre-stamping store: drop the marker, keep the index
    val fs = new org.apache.hadoop.fs.Path(idxP).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"${idxP}_planes"), false)
    val e = intercept[IllegalArgumentException] {
      VecIngest.ingestBatch(Seq((2L, vec(2))).toDF("vec_id", "embedding"),
        1L, vecsP, idxP, pairsP, 0.99) // 16-plane default
    }
    assert(e.getMessage.contains("no plane-width marker"))
    // backfilling the marker with the original width recovers the store
    assert(graft.core.Markers.tryCreate(fs,
      new org.apache.hadoop.fs.Path(s"${idxP}_planes"), "8"))
    VecIngest.ingestBatch(Seq((2L, vec(2))).toDF("vec_id", "embedding"),
      1L, vecsP, idxP, pairsP, 0.99, planesPerTable = 8)
  }

  test("expectedCorpus sizes the store via planesForCorpus and stamps that width") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("vingest5")
    val (vecsP, idxP, pairsP) = (s"$root/vecs", s"$root/index", s"$root/pairs")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = VecIngest.start(input.toDF().toDF("vec_id", "embedding"),
      vecsP, idxP, pairsP, tmp("vingest5-ckpt"), minSim = 0.99,
      expectedCorpus = Some(1L << 20))
    try {
      input.addData((1L, vec(1)))
      q.processAllAvailable()
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(idxP).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.core.Markers.read(fs,
      new org.apache.hadoop.fs.Path(s"${idxP}_planes")).contains("20"),
      "a 2^20 expected corpus must build a 20-plane store")
    // and a continuation that forgets the sizing fails loudly at the
    // 16-plane default instead of probing the wrong width
    val e = intercept[IllegalArgumentException] {
      VecIngest.ingestBatch(Seq((2L, vec(2))).toDF("vec_id", "embedding"),
        1L, vecsP, idxP, pairsP, 0.99)
    }
    assert(e.getMessage.contains("built with 20 planes"))
  }

  test("bucket probe only verifies collisions: unrelated vector produces no pair") {
    val root = tmp("vingest2")
    val (vecsP, idxP, pairsP) = (s"$root/vecs", s"$root/index", s"$root/pairs")
    VecIngest.ingestBatch(Seq((1L, vec(1)), (2L, vec(50))).toDF("vec_id", "embedding"),
      0L, vecsP, idxP, pairsP, 0.99)
    VecIngest.ingestBatch(Seq((5L, vec(77))).toDF("vec_id", "embedding"),
      1L, vecsP, idxP, pairsP, 0.99)
    // zero-row partition writes may leave no readable parquet at all —
    // unreadable IS empty for this assertion
    val nPairs =
      try spark.read.parquet(pairsP).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(nPairs == 0, "independent directions at minSim=0.99 must not pair")
  }
}
