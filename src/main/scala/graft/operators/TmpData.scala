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

  /** Filesystem/identifier-safe suffix unique per (process, dataset,
    * source-content). The content fingerprint means a REWRITTEN source
    * directory produces a new tag → new tmp path → `once` re-runs the
    * write, instead of serving a stale derived copy (the lifecycle's
    * source-immutability invariant now only has to hold between a
    * rewrite and the next query, not for the whole process lifetime).
    */
  def tag(sfDir: String): String = {
    val pid = ProcessHandle.current().pid()
    s"${pid}_${contentTag(sfDir)}"
  }

  /** Like `tag` but WITHOUT the pid term: identifies the source dataset
    * by (path, content fingerprint) alone, so a derived copy keyed on it
    * can be shared ACROSS processes — the bench's multi-row-group copy
    * is identical bytes for identical input, and rebuilding it per JVM
    * is what blew the driver's wall budget in round 4. Cross-process
    * sharing needs its own publish protocol (build staging under the
    * pid-unique `tag`, then atomic-rename into the content-keyed path);
    * see BenchData.realisticCopy.
    */
  def contentTag(sfDir: String): String = {
    val dir = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${dir}_${fingerprint(sfDir)}"
  }

  /** Metadata-only source fingerprint: file count + total bytes + max
    * mtime from a driver-side listing — no data is read. The mtime term
    * catches most size-preserving rewrites; a swap that also preserves
    * mtimes (cp -p of an equal-shaped dataset) is out of scope — that
    * requires content hashing, which a metadata-only check deliberately
    * avoids. Recomputed on every `tag`
    * call (once per QUERY invocation, never per row), so even an
    * in-place rewrite inside a long-lived session invalidates derived
    * copies; at cluster scale this is one filesystem listing per query,
    * the same metadata cost the scan's own file index pays.
    */
  private def fingerprint(sfDir: String): String = {
    val root = Paths.get(sfDir)
    if (!Files.exists(root)) "absent"
    else {
      var n = 0L
      var bytes = 0L
      var mtime = 0L
      val walk = Files.walk(root)
      try walk.forEach { p =>
        if (Files.isRegularFile(p)) {
          n += 1
          bytes += Files.size(p)
          mtime = math.max(mtime, Files.getLastModifiedTime(p).toMillis)
        }
      } finally walk.close()
      s"${n}f_${bytes}b_${mtime}t"
    }
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

/** Cache-lifecycle helper shared by the pipelines that persist a reused
  * subplan (dedup shingles, LSH candidates/vectors).
  */
private[operators] object Caching {

  /** persist(MEMORY_AND_DISK) unless the plan is already registered with
    * the session's CacheManager. `storageLevel` resolves by PLAN, not by
    * DataFrame instance, so when two queries in one session build the
    * same subplan (minhash_lsh then ngram_jaccard over the same shingle
    * relation) the second call reuses the first cache entry instead of
    * re-registering it and logging "Asked to cache already cached data".
    */
  def persistOnce(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }
}
