package graft

import java.nio.file.Files

import graft.operators.{Dedup, Graph, IndexStore}
import graft.core.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 checks: the graph-artifact flow (build the verified edge
  * list once, run every graph op from the loaded parquet artifact,
  * equal to the rebuild twin bit-for-bit).
  */
class Round11Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.collect().toSeq
    val cb = b.collect().toSeq
    assert(ca == cb)
  }

  test("all five graph ops from the loaded edge artifact equal their rebuild twins") {
    val docs = t(spark, dir, "documents")
    val path = Files.createTempDirectory("edge-index").toFile.getAbsolutePath + "/edges"
    IndexStore.buildEdgeIndex(docs, path)
    val art = IndexStore.loadEdgeIndex(spark, path)
    val rebuilt = Dedup.jaccardPairs(Dedup.shingles(docs), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))

    // artifact IS the rebuild (modulo row order — both are unordered pair sets)
    sameRows(art.orderBy("a", "b"), rebuilt.orderBy("a", "b"))

    sameRows(Graph.triangleCount(art), Graph.triangleCount(rebuilt))
    sameRows(Graph.pageRankInt(art), Graph.pageRankInt(rebuilt))
    sameRows(Graph.kCorePeel(art, k = 2), Graph.kCorePeel(rebuilt, k = 2))
    sameRows(Graph.labelPropagate(art, rounds = 2),
      Graph.labelPropagate(rebuilt, rounds = 2))
    sameRows(Graph.commonNeighbors(art, k = 20, maxDeg = Some(1000L)),
      Graph.commonNeighbors(rebuilt, k = 20, maxDeg = Some(1000L)))
  }

  test("resumable CC: killed mid-loop, resumes from the checkpoint dir bit-identical") {
    import spark.implicits._
    // ring + chain topology: needs several propagation rounds, so the
    // injected crash lands strictly mid-loop
    val ringEdges = (0L until 30L).map(i => (i, (i + 1) % 30)) ++
      (100L until 120L).map(i => (i, i + 1))
    val pairs = ringEdges.toDF("doc_a", "doc_b")

    val workDir = Files.createTempDirectory("cc-resume").toFile.getAbsolutePath

    // uninterrupted truth (fresh work dir)
    val truthDir = Files.createTempDirectory("cc-truth").toFile.getAbsolutePath
    val truth = Dedup.canonicalClustersResumable(pairs, truthDir)
      .orderBy("doc_id").collect().toSeq
    // and it agrees with the in-memory checkpointed loop
    val inMem = Dedup.canonicalClusters(pairs)
      .orderBy("doc_id").collect().toSeq
    assert(truth == inMem)

    // kill the loop after round 2 is durably committed
    class Killed extends RuntimeException("injected executor-loss")
    val crashed = intercept[Killed] {
      Dedup.canonicalClustersResumable(pairs, workDir,
        onRoundComplete = r => if (r == 2) throw new Killed)
    }
    assert(crashed.getMessage == "injected executor-loss")

    // resume: must pick up at round 2, not restart — record every round
    // the resumed run commits and assert none below 3 re-ran
    var resumedRounds = List.empty[Int]
    val recovered = Dedup.canonicalClustersResumable(pairs, workDir,
        onRoundComplete = r => resumedRounds ::= r)
      .orderBy("doc_id").collect().toSeq
    assert(resumedRounds.forall(_ >= 3),
      s"resume re-ran pre-crash rounds: ${resumedRounds.sorted}")
    assert(recovered == truth, "recovered cluster map is bit-identical")

    // crash LATE, after the two-generations-back GC has deleted the
    // early rounds (rounds 0..2 gone by round 4): resume must find the
    // highest complete round by listing, not by walking from round 0
    val lateDir = Files.createTempDirectory("cc-late").toFile.getAbsolutePath
    intercept[Killed] {
      Dedup.canonicalClustersResumable(pairs, lateDir,
        onRoundComplete = r => if (r == 4) throw new Killed)
    }
    var lateRounds = List.empty[Int]
    val lateRecovered = Dedup.canonicalClustersResumable(pairs, lateDir,
        onRoundComplete = r => lateRounds ::= r)
      .orderBy("doc_id").collect().toSeq
    assert(lateRounds.forall(_ >= 5),
      s"late resume re-ran pre-crash rounds: ${lateRounds.sorted}")
    assert(lateRecovered == truth, "late-crash recovery is bit-identical")
  }

  test("partition-count invariance: integer-exact gates are identical at 5 vs 32 shuffle partitions") {
    // These gates document bit-portable results (integer sums, hash
    // total orders, min-label fixpoints) — which implies independence
    // from PHYSICAL parallelism. Assert it directly: same rows at a
    // prime, tiny partition count and at the benchmark's 32. Multiset
    // compare (row order can legitimately differ where the trailing
    // ORDER BY key is non-unique).
    val names = Seq("x_graph_pagerank", "x_sample_systematic",
      "x_sample_weighted", "x_dedup_clusters", "x_corpus_pack_sequences")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (n <- names) {
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val at5 = SparkEntry.queries(n)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val at32 = SparkEntry.queries(n)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
        assert(at5 == at32, s"$n differs across shuffle partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
