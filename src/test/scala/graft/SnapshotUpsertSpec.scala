package graft

import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC apply: change batches fold into a versioned parquet
  * snapshot; replaying a batch reproduces the identical version
  * (exactly-once over the at-least-once foreachBatch contract). */
class SnapshotUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def snapshotRows(dir: String): Set[(Long, String, Double)] =
    SnapshotUpsert.readSnapshot(spark, dir).get
      .as[(Long, String, Double)].collect().toSet

  test("batches apply in order; replayed batch rewrites its version identically") {
    val dir = tmp("snap")
    val apply = SnapshotUpsert.applyBatch(dir, "k") _

    val b0 = Seq(("I", 1L, "a", 10.0), ("I", 2L, "b", 20.0), ("I", 3L, "c", 30.0))
      .toDF("op", "k", "v", "x")
    apply(b0, 0L)
    assert(snapshotRows(dir) == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))

    val b1 = Seq(("U", 2L, "b2", 22.0), ("D", 3L, "c", 30.0), ("I", 9L, "z", 90.0))
      .toDF("op", "k", "v", "x")
    apply(b1, 1L)
    val expected = Set((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "z", 90.0))
    assert(snapshotRows(dir) == expected)

    // at-least-once replay of batch 1: reads the version strictly
    // below its id (v0, not its own first attempt) and rewrites v1
    // byte-identically
    apply(b1, 1L)
    assert(snapshotRows(dir) == expected, "replay is a no-op")
    assert(SnapshotUpsert.versions(spark, dir).sorted == Seq(0L, 1L))

    // time travel: version 0 still readable
    assert(SnapshotUpsert.readSnapshot(spark, dir, beforeBatch = 1L).get.count() == 3)
  }

  test("compact rewrites the tip into fewer files; vacuum drops old versions") {
    val dir = tmp("snap-maint")
    val apply = SnapshotUpsert.applyBatch(dir, "k") _
    apply(Seq(("I", 1L, "a", 1.0), ("I", 2L, "b", 2.0)).toDF("op", "k", "v", "x")
      .repartition(4), 0L)
    apply(Seq(("I", 3L, "c", 3.0)).toDF("op", "k", "v", "x"), 1L)
    val before = snapshotRows(dir)
    val v = SnapshotUpsert.compact(spark, dir, nFiles = 1)
    assert(v == 2L && snapshotRows(dir) == before, "compaction preserves content")
    val files = new java.io.File(s"$dir/version=2")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, "tip compacted to one file")
    val dropped = SnapshotUpsert.vacuum(spark, dir, keep = 1)
    assert(dropped == Seq(0L, 1L))
    assert(SnapshotUpsert.versions(spark, dir) == Seq(2L))
    assert(snapshotRows(dir) == before, "tip survives vacuum")
  }

  test("streaming end-to-end over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("snap-stream")
    val input = MemoryStream[(String, Long, String, Double)]
    val q = SnapshotUpsert.start(input.toDF().toDF("op", "k", "v", "x"),
      dir, "k", tmp("snap-ckpt"))
    try {
      input.addData(("I", 1L, "a", 1.0), ("I", 2L, "b", 2.0))
      q.processAllAvailable()
      input.addData(("U", 1L, "a2", 1.5), ("D", 2L, "b", 2.0), ("I", 3L, "c", 3.0))
      q.processAllAvailable()
      assert(snapshotRows(dir) == Set((1L, "a2", 1.5), (3L, "c", 3.0)))
    } finally q.stop()
  }
}
