package graft.lake

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** THE content-stamp helpers for session-memoized staged artifacts
  * (r18 — ADVICE r17: `Qx.tableStamp` and `MicroBatch.contentStamp`
  * were duplicate implementations, and stamping the memo KEY meant a
  * regenerated testdata file stranded the superseded map entry — the
  * stale LakeTable/landing dir stayed reachable for the life of the
  * session). One implementation lives here; [[StampedMemo]] keys the
  * map by IDENTITY and stores `(stamp, value)`, REPLACING the entry on
  * a stamp mismatch, so a superseded artifact is dropped the moment
  * its source table regenerates (the temp dirs behind it are already
  * registered for JVM-exit deletion via [[TempDirs]]). */
object Stamps {

  /** Content stamp for artifacts derived from a testdata table: the
    * source parquet's mtime, so regenerated testdata rebuilds the
    * artifact instead of silently serving a stale one. */
  def tableStamp(sfDir: String, table: String): Long = {
    val p = Paths.get(s"$sfDir/$table.parquet")
    if (Files.exists(p)) Files.getLastModifiedTime(p).toMillis else 0L
  }

  /** A per-identity memo whose entries carry a content stamp: a get
    * with a matching stamp returns the cached value; a mismatched
    * stamp REBUILDS and replaces the entry (no stranded artifacts).
    * `compute` gives the same build-exactly-once guarantee under
    * concurrent first access that the old `computeIfAbsent` pattern
    * had.
    *
    * USAGE CONTRACT (ADVICE r18): `build` runs INSIDE the map's
    * per-bin lock — a multi-second Spark artifact build serializes any
    * unrelated key that hashes to the same bin for its duration, and a
    * `build` that (transitively) calls `getOrBuild` on the SAME memo
    * throws IllegalStateException ("recursive update"). Both held for
    * the old computeIfAbsent too; they are the accepted trade for
    * build-exactly-once. Keep builds non-reentrant, and if bin
    * contention ever measures as real, move to a per-key lazy holder
    * (compute stores a Lazy, the build runs outside the lock). */
  final class StampedMemo[V] {
    private val m = new ConcurrentHashMap[String, (Long, V)]()
    def getOrBuild(idKey: String, stamp: Long)(build: => V): V =
      m.compute(idKey, (_, old) =>
        if (old != null && old._1 == stamp) old else (stamp, build))._2
  }
}
