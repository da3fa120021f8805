package graft

import java.nio.file.{Files, Path}

/** Tracked temp directories for sink/rollup/stream scratch space.
  *
  * Every operator that materializes intermediate parquet (stream sinks,
  * rollup builds, versioned key-model histories) allocates through here; a
  * JVM shutdown hook removes everything recursively, so repeated harness
  * runs don't accumulate orphan dirs (VERDICT r3 hygiene note). Deletion
  * must be deferred to shutdown — the DataFrames returned by query builders
  * read these dirs lazily, after the builder has exited.
  */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => purge()))

  /** Create a tracked temp dir; returns its absolute path as a string. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Create a tracked temp dir; returns the Path (for resolve/symlink use). */
  def createPath(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  /** Close-safe recursive delete (Files.walk streams hold an open directory
    * fd until closed — every caller must release it, LEAKCHECK discipline).
    * `keepRoot` empties the tree but leaves the root dir itself. */
  def deleteTree(p: Path, keepRoot: Boolean = false): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .filter(f => !(keepRoot && f == p))
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  private def purge(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      try deleteTree(p)
      catch { case _: Exception => () } // shutdown: best-effort only
      p = dirs.poll()
    }
  }
}
