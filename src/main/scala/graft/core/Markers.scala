package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** Tiny durable markers (width stamps, leases) for parquet-backed
  * stores — the metadata a growing artifact needs so that a resumed,
  * replayed, or concurrently-launched job fails LOUDLY instead of
  * silently corrupting the store.
  *
  * Two invariants the naive `fs.create` + `out.write` pattern lacks,
  * both hit in review (r11 ADVICE):
  *   - **atomic content**: a crash between create and write leaves an
  *     empty file that later parses as garbage. Here the content is
  *     written to a temp sibling and RENAMED into place — rename is
  *     atomic on HDFS and posix local filesystems, so a marker either
  *     exists with full content or not at all.
  *   - **first-writer-wins**: `FileSystem.rename` refuses an existing
  *     destination, so two racing first writers cannot both think they
  *     stamped — the loser's rename fails and it must re-read and
  *     compare, exactly the check-then-act race `create(overwrite =
  *     true)` papered over.
  */
object Markers {

  /** Marker content, or None if absent. Raises a clear error naming
    * the path on an empty/unreadable marker instead of letting the
    * caller's parse throw an opaque NumberFormatException. */
  def read(fs: FileSystem, path: Path): Option[String] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val s =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), UTF_8).trim
        finally in.close()
      if (s.isEmpty)
        throw new IllegalStateException(
          s"corrupt/empty marker at $path — a writer crashed mid-stamp " +
            "(pre-atomic-rename layout); delete the marker to re-stamp, or " +
            "restore it from the store's known parameters")
      Some(s)
    }

  /** Atomically create `path` with `content` iff it does not exist.
    * Returns true when THIS call created it; false when another writer
    * won (or it already existed) — in which case the caller re-reads
    * and compares. Never leaves a partial marker. */
  def tryCreate(fs: FileSystem, path: Path, content: String): Boolean = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(UTF_8))
    finally out.close()
    val won = fs.rename(tmp, path)
    if (!won) fs.delete(tmp, false)
    won
  }

  /** [[tryCreate]] with a bounded wait: poll until the marker could be
    * created or `maxWaitMs` elapses. Returns true iff THIS call created
    * it. `maxWaitMs = 0` is exactly one attempt (the loud-fail path).
    * The wait is bounded by design — a dead claimer's stranded marker
    * must still surface as a loud failure at the caller, never an
    * unbounded hang; the caller's error message carries the recovery
    * runbook (delete the marker if no claimer is live). */
  def tryCreateWithin(fs: FileSystem, path: Path, content: String,
      maxWaitMs: Long, pollMs: Long = 100L): Boolean = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var won = tryCreate(fs, path, content)
    while (!won && System.nanoTime() < deadline) {
      Thread.sleep(math.max(1L, pollMs))
      won = tryCreate(fs, path, content)
    }
    won
  }

  /** Unconditional overwrite, still atomic in content: full temp write,
    * delete the old marker, rename in. The delete+rename pair is not
    * a single atomic step — only use on paths the caller already owns
    * (e.g. a lease takeover after the guard has passed). */
  def forceWrite(fs: FileSystem, path: Path, content: String): Unit = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(UTF_8))
    finally out.close()
    fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(s"lost a takeover race writing marker $path")
  }
}
