package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Shared write-once lifecycle for derived tmp datasets (bucketed copies,
  * partitioned copies, format round-trips). One implementation so the
  * invariants hold everywhere at once:
  *  - keys/paths are per-(process, dataset) → concurrent JVMs and
  *    SF-switching sessions can never read each other's copies;
  *  - `once` is synchronized and marks ready only AFTER the write
  *    succeeds → no check-then-act double write, and a failed write is
  *    retried on the next call instead of poisoning the session;
  *  - every created path is removed by a JVM shutdown hook → repeated
  *    Verify/Bench invocations don't accumulate tmp copies forever.
  */
private[operators] object TmpData {

  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { p =>
      val root = Paths.get(p)
      if (Files.exists(root)) {
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        catch { case _: Exception => () } // best-effort cleanup
      }
    }))

  /** Filesystem/identifier-safe suffix unique per (process, dataset). */
  def tag(sfDir: String): String = {
    val pid = ProcessHandle.current().pid()
    val dir = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${pid}_$dir"
  }

  /** Tmp directory path for a derived dataset, registered for cleanup. */
  def path(kind: String, tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_$tag"
    created.add(p)
    p
  }

  /** Run `write` exactly once per key (atomic; marked AFTER success). */
  def once(key: String)(write: => Unit): Unit = synchronized {
    if (!ready.contains(key)) {
      write
      ready.add(key)
    }
  }
}
