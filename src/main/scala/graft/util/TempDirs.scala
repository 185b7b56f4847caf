package graft.util

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Session-scoped scratch directories for queries that round-trip through
  * a filesystem store (CSV/ORC/XML round trips, streaming upsert stores,
  * the q129 fingerprint store). Every dir allocated here is removed by a
  * JVM shutdown hook, so repeated bench/verify runs don't accumulate
  * disk — the same hygiene Pipeline.dropCheckpoint applies to streaming
  * checkpoints, centralized for batch stores.
  */
object TempDirs {
  private val registered = mutable.ArrayBuffer.empty[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.synchronized(registered.foreach { p =>
      try deleteRecursively(p)
      catch { case e: java.io.IOException => System.err.println(s"TempDirs: could not delete $p: ${e.getMessage}") }
    })))

  /** Create a registered temp directory; returns its absolute path. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.synchronized { registered += p }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      scala.util.Using.resource(Files.walk(p)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    }
}
