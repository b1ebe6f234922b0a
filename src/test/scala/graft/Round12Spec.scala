package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.core.Markers
import graft.operators.{Dedup, IndexStore}

/** Round 12: the artifact flow promoted to all five graph gates
  * (build-once semantics asserted, not just claimed), the resumable-CC
  * workdir lifecycle (lease guard + cleanup-on-success), and the
  * atomic-marker primitives both guards share. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  // ---- graph artifact flow ----

  test("all four new *_indexed graph gates equal their rebuild twins") {
    for ((rebuild, indexed) <- Seq(
        "x_graph_pagerank" -> "x_graph_pagerank_indexed",
        "x_graph_kcore" -> "x_graph_kcore_indexed",
        "x_graph_communities" -> "x_graph_communities_indexed",
        "x_graph_common_neighbors" -> "x_graph_common_neighbors_indexed")) {
      val r = SparkEntry.queries(rebuild)(spark, dir).collect().map(_.toString).toSeq
      val i = SparkEntry.queries(indexed)(spark, dir).collect().map(_.toString).toSeq
      // common_neighbors is legitimately EMPTY at sf0.001 (every wedge
      // pair of the tiny graph is already adjacent) — equality is the
      // contract; row volume is the sf0.01 driver gate's job
      assert(r == i, s"$indexed differs from $rebuild")
      if (rebuild != "x_graph_common_neighbors")
        assert(r.nonEmpty, s"$rebuild unexpectedly empty at sf0.001")
    }
  }

  test("edge artifact is built once per JVM across the indexed gates") {
    val path = IndexStore.defaultPath("edges", dir)
    // first indexed gate (or an earlier test) pays the build
    SparkEntry.queries("x_graph_triangles_indexed")(spark, dir).collect()
    def stamp: Map[String, Long] = {
      val p = new Path(path)
      fs.listStatus(p).map(s => s.getPath.getName -> s.getModificationTime).toMap
    }
    val before = stamp
    // two more consumers of the same artifact: no rewrite allowed
    SparkEntry.queries("x_graph_kcore_indexed")(spark, dir).collect()
    SparkEntry.queries("x_graph_communities_indexed")(spark, dir).collect()
    assert(stamp == before,
      "a second indexed gate rebuilt the edge artifact — build-once memo broken")
  }

  // ---- resumable CC lifecycle ----

  private def ccPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    .toDF("doc_a", "doc_b")
  private val ccExpected =
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))

  private def runCc(work: String, cleanup: Boolean = true,
      break: Boolean = false): Seq[(Long, Long)] =
    Dedup.canonicalClustersResumable(ccPairs, work,
        cleanupOnSuccess = cleanup, breakLease = break)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq

  test("resumable CC cleans its workDir on success (default) and the result survives") {
    val work = tmp("cc12-clean") + "/w"
    assert(runCc(work) == ccExpected)
    assert(!fs.exists(new Path(work)),
      "cleanupOnSuccess must remove rounds, edges, and lease")
  }

  test("resumable CC with cleanupOnSuccess=false keeps state but releases the lease") {
    val work = tmp("cc12-keep") + "/w"
    assert(runCc(work, cleanup = false) == ccExpected)
    assert(fs.exists(new Path(s"$work/edges/_SUCCESS")), "edge list kept")
    assert(!fs.exists(new Path(s"$work/_graft_lease")), "lease released")
    // …and a later run (same app) can reuse/redo the dir freely
    assert(runCc(work) == ccExpected)
    assert(!fs.exists(new Path(work)))
  }

  test("a workDir leased to another live application fails loudly; breakLease takes over") {
    val work = tmp("cc12-lease") + "/w"
    assert(Markers.tryCreate(fs, new Path(s"$work/_graft_lease"), "app-somebody-else"))
    val e = intercept[IllegalStateException] { runCc(work) }
    assert(e.getMessage.contains("leased by application app-somebody-else"))
    // deterministic state -> explicit takeover of a dead job is sound
    assert(runCc(work, break = true) == ccExpected)
  }

  test("gate row x_dedup_clusters_resumable hash-matches the in-memory clusters gate") {
    val durable = SparkEntry.queries("x_dedup_clusters_resumable")(spark, dir)
      .collect().map(_.toString).toSeq
    val inMem = SparkEntry.queries("x_dedup_clusters")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(durable.nonEmpty && durable == inMem)
  }

  test("x_stats_cms_bound: every probe estimate within the one-sided CMS bound") {
    val rows = SparkEntry.queries("x_stats_cms_bound")(spark, dir).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getBoolean(2)),
      "a deterministic-hash sketch out of bound means the sketch or the bound is wrong")
  }

  // ---- bench fork grouping ----

  test("bench groups are a deterministic exact partition of the name list") {
    val names = ('a' to 'z').map(c => s"q_$c")
    for (forks <- Seq(1, 3, 4, 7, 26, 40)) {
      val gs = Bench.makeGroups(names, forks)
      assert(gs.flatten.sorted == names.sorted,
        s"forks=$forks must cover every name exactly once")
      assert(gs.size == math.min(forks.max(1), names.size))
      assert(gs == Bench.makeGroups(names, forks), "pure function of input")
      // striping: group sizes differ by at most one, so no child JVM
      // inherits an alphabetical block of heavy neighbors
      assert(gs.map(_.size).max - gs.map(_.size).min <= 1)
    }
    // striping shape: group i holds every forks-th name from offset i
    assert(Bench.makeGroups(names, 4).head.take(3) == Seq("q_a", "q_e", "q_i"))
    assert(Bench.makeGroups(names, 4)(1).take(3) == Seq("q_b", "q_f", "q_j"))
  }

  // ---- atomic markers ----

  test("Markers.tryCreate is first-writer-wins and never leaves partial content") {
    val p = new Path(tmp("mark12"), "stamp")
    assert(Markers.tryCreate(fs, p, "16"))
    assert(!Markers.tryCreate(fs, p, "8"), "second writer must lose")
    assert(Markers.read(fs, p).contains("16"), "loser must not clobber")
    assert(fs.listStatus(p.getParent).length == 1, "no temp litter")
  }

  test("an empty marker (pre-atomic crash artifact) raises a clear error, not a parse failure") {
    val p = new Path(tmp("mark12-empty"), "stamp")
    fs.create(p, true).close() // the exact partial state fs.create+write could leave
    val e = intercept[IllegalStateException] { Markers.read(fs, p) }
    assert(e.getMessage.contains("corrupt/empty marker"))
    assert(e.getMessage.contains(p.getName))
  }
}
