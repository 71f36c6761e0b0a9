package graft.lake

import java.nio.file.{Files, Path}

import scala.util.Using

/** JVM-exit cleanup registry for temp fixture directories (ADVICE
  * r12: every Verify run and Bench rep creates fresh temp lake
  * tables and export dirs and never deletes them, so repeated runs
  * accumulate unbounded /tmp usage). One shutdown hook, registered
  * lazily on first use, recursively deletes everything registered —
  * best effort on the exit path, since a half-deleted temp dir is
  * harmless. */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try
          Using.resource(Files.walk(d)) { s =>
            s.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
          }
        catch { case _: Throwable => () }
      }, "graft-tempdir-cleanup"))

  /** Create a temp directory registered for recursive deletion at
    * JVM exit. */
  def create(prefix: String): Path = {
    hook
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}
