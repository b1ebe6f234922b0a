package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded takedown-set storage for the stores that read tombstones
  * purely as a SET (the ANN codes forest and the dedup band forest —
  * NOT the postings store, whose serve-time score corrections compare
  * per-row tombstone batch ids against sidecar cutoffs and therefore
  * keep the raw per-batch layout).
  *
  * The problem: takedowns land as `tombstones/batch_id=<id>/` dirs
  * through the idempotent sink, one dir per request batch, FOREVER —
  * after gen rebasing and hot-store compaction, the last unbounded
  * listing bill in those layouts. The obvious fix — fold old batches
  * with [[Compaction.compact]] — is UNSOUND here: compaction collapses
  * rows onto the lowest folded id's dir, and a replayed/retried
  * `tombstone(ids, thatId)` call would dynamic-overwrite the merged
  * segment with only its own rows, silently shrinking the PERMANENT
  * takedown set (r18 review wave; for the hot stores the same overlap
  * is benign duplication, which is why compact is fine there).
  *
  * The sound shape: a SNAPSHOT outside the `batch_id=` namespace.
  *   - `tombstones_snapshot/v=<n>/` — the distinct union of every
  *     takedown id folded so far, each version carrying a `_covers`
  *     marker = the highest batch id it reflects. Resolve = the
  *     highest stamped version; installs are scratch + one atomic
  *     rename with keep-two-back retention (the r17 sidecar-versioning
  *     discipline), so a reader never sees a half-written snapshot and
  *     one resolved just before a fold survives the fold.
  *   - Readers union the snapshot with only the batch dirs ABOVE its
  *     `_covers` stamp. A replay that recreates a folded dir is
  *     thereby invisible (its rows are already in the snapshot — the
  *     sink contract says a replayed id carries identical content),
  *     and the next fold deletes it again. No write can ever land ON
  *     the snapshot: it is not a batch dir.
  *   - Folds only run over batch ids at or below the store's `_purged`
  *     stamp: those takedowns are fully reflected in the forest (their
  *     rows are physically gone), so the snapshot's only job is the
  *     permanent re-ingest-stays-dead id-set — exactly what a distinct
  *     union preserves.
  *
  * Crash windows: scratch is rebuilt from scratch on retry; a crash
  * between install and source-dir deletion leaves dirs <= `_covers`
  * that readers already exclude and the next fold re-deletes; a crash
  * mid-deletion is the same state. Every step is idempotent, and the
  * whole fold runs under the caller's maintenance window (maintain()
  * invokes it after consolidate/rebase on the same schedule).
  */
object TombstoneStore {

  private val BatchDir = "batch_id=(\\d+)".r
  private val VerDir = "v=(\\d+)".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def numbered(fs: FileSystem, root: Path,
      pat: scala.util.matching.Regex): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { s =>
      s.getPath.getName match {
        case pat(id) if s.isDirectory => Some(id.toLong -> s.getPath)
        case _                        => None
      }
    }

  private def snapRoot(idx: Path) = new Path(idx, "tombstones_snapshot")

  /** The resolved snapshot: highest version dir whose `_covers` stamp
    * exists (an unstamped dir is a crashed install — ignored, the next
    * fold's install supersedes it). */
  private def resolveSnapshot(fs: FileSystem,
      idx: Path): Option[(Long, Path, Long)] =
    numbered(fs, snapRoot(idx), VerDir).sortBy(-_._1).iterator.flatMap {
      case (v, p) => graft.core.Markers.read(fs, new Path(p, "_covers"))
        .map(c => (v, p, c.toLong))
    }.nextOption()

  /** Highest batch id the resolved snapshot reflects; -1 without one. */
  def coveredThrough(spark: SparkSession, indexPath: String): Long = {
    val idx = new Path(indexPath)
    resolveSnapshot(fsOf(spark, idx), idx).map(_._3).getOrElse(-1L)
  }

  /** The full takedown id-set: snapshot (if any) unioned with the
    * batch dirs ABOVE its covered stamp. None when no takedown has
    * ever landed. `idCol` is the store's id column (vec_id / doc_id). */
  def read(spark: SparkSession, indexPath: String,
      idCol: String): Option[DataFrame] = {
    val idx = new Path(indexPath)
    val fs = fsOf(spark, idx)
    val snap = resolveSnapshot(fs, idx)
    val covers = snap.map(_._3).getOrElse(-1L)
    val tail = numbered(fs, new Path(idx, "tombstones"), BatchDir)
      .filter(_._1 > covers).map(_._2.toString)
    val parts = snap.map(_._2.toString).toSeq ++ tail
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts: _*).select(idCol).distinct())
  }

  /** Loud guard for the one contract the snapshot needs from writers:
    * a batch id at or below the snapshot's covered stamp is invisible
    * to every reader (its dir is excluded and will be deleted), so a
    * NEW takedown landed there would be silently dropped — refuse it
    * instead. A RETRY of the original write with that id is refused
    * too, which is safe: its rows are already in the snapshot. */
  def requireFreshBatchId(spark: SparkSession, indexPath: String,
      batchId: Long): Unit = {
    val covers = coveredThrough(spark, indexPath)
    require(batchId > covers,
      s"tombstone batch id $batchId is at or below the snapshot's covered " +
        s"stamp ($covers) at $indexPath/tombstones_snapshot — that id's dir " +
        "is invisible to readers and will be deleted by the next fold. If " +
        "this is a retry, the original write is already folded in; if it " +
        "is a new takedown, use a fresh (higher) batch id")
  }

  /** Fold every tombstone batch dir with id <= `purged` into the
    * versioned snapshot and delete the folded dirs. No-op when nothing
    * at or below `purged` remains unfolded. Idempotent at every crash
    * point. Runs under the index's `_consolidate_commit` lease — the
    * scratch dir is shared, and two concurrent folds could otherwise
    * interleave on it (one stamping and installing the other's
    * half-written build). */
  def fold(spark: SparkSession, indexPath: String, purged: Long,
      idCol: String): Unit = {
    val idx = new Path(indexPath)
    val fs = fsOf(spark, idx)
    val claim = new Path(idx, "_consolidate_commit")
    if (!graft.core.Markers.tryCreate(fs, claim,
        s"${java.util.UUID.randomUUID()}\ntombstone-fold $purged"))
      throw new IllegalStateException(
        s"index $indexPath already has a maintenance op in flight (or a " +
          s"dead one's marker) — if no maintainer is live, delete $claim " +
          "and re-run (every phase is idempotent)")
    try foldUnderLease(spark, idx, fs, purged, idCol)
    finally fs.delete(claim, false)
  }

  private def foldUnderLease(spark: SparkSession, idx: Path,
      fs: FileSystem, purged: Long, idCol: String): Unit = {
    val snap = resolveSnapshot(fs, idx)
    val covers = snap.map(_._3).getOrElse(-1L)
    val foldable = numbered(fs, new Path(idx, "tombstones"), BatchDir)
      .filter { case (id, _) => id <= purged }
    if (foldable.forall(_._1 <= covers) &&
        (foldable.isEmpty || snap.nonEmpty)) {
      // nothing new to fold; still settle leftover covered dirs from a
      // crashed prior deletion phase
      foldable.filter(_._1 <= covers).foreach(d => fs.delete(d._2, true))
      return
    }
    val newCovers = math.max(covers, foldable.map(_._1).max)
    val union = (snap.map(_._2.toString).toSeq ++ foldable.map(_._2.toString))
      .distinct
    val scratch = new Path(idx, ".tomb-snap-scratch")
    if (fs.exists(scratch)) fs.delete(scratch, true)
    spark.read.parquet(union: _*).select(idCol).distinct()
      .coalesce(1).write.mode("errorifexists").parquet(scratch.toString)
    // stamp INSIDE the scratch before the rename: the stamp travels
    // with the dir, so an installed-but-unstamped version is
    // recognizable as a crashed install and never resolves
    graft.core.Markers.forceWrite(fs, new Path(scratch, "_covers"),
      newCovers.toString)
    // next version = past EVERY existing v dir, stamped or not: Hadoop
    // rename into an existing dir moves the source INSIDE it, so
    // renaming onto an unstamped orphan (external damage) would
    // install an unresolvable snapshot and the source deletion below
    // would then lose the folded ids from every read
    val nextV = (numbered(fs, snapRoot(idx), VerDir).map(_._1) :+ -1L).max + 1
    fs.mkdirs(snapRoot(idx))
    require(fs.rename(scratch, new Path(snapRoot(idx), s"v=$nextV")),
      s"failed to install tombstone snapshot v=$nextV at $idx")
    // retention: keep the two highest STAMPED versions (a reader that
    // resolved the previous one just before this install scans a
    // complete snapshot); everything else — older stamped versions and
    // unstamped orphans alike — is settled debt, safe to delete under
    // the lease
    val keep = numbered(fs, snapRoot(idx), VerDir)
      .filter { case (_, p) =>
        graft.core.Markers.read(fs, new Path(p, "_covers")).nonEmpty }
      .map(_._1).sorted.takeRight(2).toSet
    numbered(fs, snapRoot(idx), VerDir)
      .filterNot(d => keep.contains(d._1)).foreach(d => fs.delete(d._2, true))
    // sources last — a crash before this point leaves dirs readers
    // already exclude
    foldable.foreach(d => fs.delete(d._2, true))
  }
}
