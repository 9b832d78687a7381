package graft

import java.nio.file.{Files, Path}

/** Driver-local temp directories with JVM-exit cleanup. Verify/Bench build
  * several throwaway indexes per run (merge gates, streaming segments,
  * compaction output); without a teardown the dirs accumulate under /tmp
  * across repeated runs in one box (round-2 advice). Scope: these paths
  * are only ever used with local[] masters — cluster-side artifacts go
  * through the Hadoop FS API with explicit roots instead. */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach { p =>
      try deleteRecursively(p)
      catch { case _: Throwable => () } // exit-time best effort
    }
  }))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively(_))
      finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Create a temp directory that is removed at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
