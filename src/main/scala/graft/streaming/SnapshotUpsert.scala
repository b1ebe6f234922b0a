package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply: a change stream (op, key, payload...) folded
  * into a continuously-maintained parquet snapshot — the streaming
  * form of [[graft.operators.Cdc.mergeUpsert]] (reference analog: the
  * update-join patch steps it runs as batch scripts), i.e. a minimal
  * copy-on-write table.
  *
  * Versioned-snapshot layout, one dir per micro-batch:
  * `snapshotDir/version=<batchId>`. Each batch merges onto the LATEST
  * VERSION STRICTLY BELOW ITS OWN ID and overwrites only its own
  * version dir. That single rule gives exactly-once semantics over
  * foreachBatch's at-least-once contract: a replayed batch re-reads
  * the same predecessor (its own first attempt is excluded by the
  * strict bound, so a half-written crash artifact is never an input)
  * and deterministically rewrites the same output dir. Readers take
  * the max committed version; old versions double as time travel and
  * are vacuumed on a schedule.
  *
  * At 100 TB the full-snapshot rewrite per batch becomes
  * partition-level: write the snapshot partitioned by a natural key
  * (date/source) with dynamic partition overwrite, so a batch
  * rewrites only the partitions its keys touch — the merge logic is
  * unchanged (this is exactly the Delta/Iceberg copy-on-write shape,
  * built from plain parquet + the version rule).
  */
object SnapshotUpsert {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed versions under `snapshotDir` (dirs named version=N with
    * a _SUCCESS marker). */
  def versions(spark: SparkSession, snapshotDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(snapshotDir)
    val f = fs(spark, snapshotDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("version="))
      .filter(s => f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("version=").toLong)
  }

  /** The snapshot as of the newest committed version < `beforeBatch`
    * (None = no predecessor; Long.MaxValue reads the current tip). */
  def readSnapshot(spark: SparkSession, snapshotDir: String,
      beforeBatch: Long = Long.MaxValue): Option[DataFrame] =
    versions(spark, snapshotDir).filter(_ < beforeBatch)
      .sorted.lastOption
      .map(v => spark.read.parquet(s"$snapshotDir/version=$v"))

  /** One micro-batch: merge `changes` onto the predecessor snapshot
    * and commit `version=batchId`. Exposed for spec-level direct use
    * (and for batch backfills — the function is the same). */
  def applyBatch(snapshotDir: String, key: String)(
      changes: DataFrame, batchId: Long): Unit = {
    val merged = readSnapshot(changes.sparkSession, snapshotDir, batchId) match {
      case Some(snap) => Cdc.mergeUpsert(snap, changes, key)
      case None => changes.filter(col("op") =!= "D").drop("op")
    }
    merged.write.mode("overwrite").parquet(s"$snapshotDir/version=$batchId")
  }

  /** Rewrite the tip into `nFiles` files as a NEW version (tip+1) —
    * small-file compaction for the version store, safe under
    * concurrent readers because old versions are immutable; the
    * streaming writer must be paused (or compaction run from its own
    * foreachBatch slot) so version ids stay monotone. */
  def compact(spark: SparkSession, snapshotDir: String, nFiles: Int): Long = {
    val vs = versions(spark, snapshotDir)
    require(vs.nonEmpty,
      s"no committed versions at $snapshotDir — nothing to compact " +
        "(an empty store would otherwise die as an opaque empty.max)")
    val tip = vs.max
    val next = tip + 1
    spark.read.parquet(s"$snapshotDir/version=$tip")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$snapshotDir/version=$next")
    next
  }

  /** Drop all committed versions except the newest `keep` (bounds the
    * time-travel window and the store's disk footprint). Returns the
    * versions deleted. */
  def vacuum(spark: SparkSession, snapshotDir: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1 (got $keep)")
    val doomed = versions(spark, snapshotDir).sorted.dropRight(keep)
    val f = fs(spark, snapshotDir)
    doomed.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$snapshotDir/version=$v"), true)
    }
    doomed
  }

  /** Start the apply stream over a change-row stream. */
  def start(changeStream: DataFrame, snapshotDir: String, key: String,
      checkpointDir: String): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, id: Long) => applyBatch(snapshotDir, key)(df, id))
      .start()
}
