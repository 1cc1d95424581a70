package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tracked temporary directories for queries that materialize scratch data
  * (staged sinks, compaction rewrites, stream checkpoints, embedded Derby
  * databases).
  *
  * Many declared queries RETURN a lazily-evaluated frame that still reads
  * from its scratch dir (a parquet snapshot, a JDBC table), so eager
  * deletion inside the query is wrong in general. Instead every dir is
  * registered here and removed in one JVM shutdown hook — repeated
  * verify/bench runs no longer accumulate disk. Queries whose scratch is
  * provably dead before return (e.g. compact_files, whose output is built
  * from driver-side literals) delete eagerly via [[delete]].
  */
object TempDirs {

  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    // Embedded Derby holds db.lck + open file handles until the ENGINE is
    // shut down, so deleting a live database dir silently leaves the lock
    // and data files behind (per-file failures are swallowed below) and
    // repeated runs leak scratch. Shut the whole engine down first; Derby
    // signals a successful full shutdown by THROWING SQLException XJ015.
    try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
    catch { case _: Throwable => () }
    var p = registry.poll()
    while (p != null) { deleteRecursively(p); p = registry.poll() }
  }, "graft-tempdir-cleanup"))

  /** Create a temp directory deleted on JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registry.add(p)
    p.toString
  }

  /** Eagerly delete a directory created by [[create]]. */
  def delete(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    registry.remove(p)
    deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally s.close()
    }
}
