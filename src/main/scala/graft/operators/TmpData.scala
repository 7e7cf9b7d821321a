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

  /** Marker that publishes a shared state root as complete — written
    * into staging LAST, so its presence in the content-keyed path
    * proves the atomic rename moved a fully-built copy (the same
    * protocol as BenchData's bench-layout cache).
    */
  private val okMarker = "_GRAFT_STATE_OK"

  /** How long a published shared-state root of ANOTHER stamp survives
    * before the prune reclaims it — long enough that a concurrently
    * running process built on the old stamp (a different code version
    * sharing the box) finishes reading it first. Cross-VERSION
    * concurrency beyond this window is out of scope: the loser sees a
    * vanished root and rebuilds into its own staging dir.
    */
  private val pruneGraceMs: Long = 2L * 60 * 60 * 1000

  /** Short fingerprint of build-recipe/layout strings, for use as the
    * `stamp` term of [[sharedState]] keys: any edit to a layout version
    * or to the builder's recipe text produces a new key, so a stale
    * cross-process cache can never serve a differently-built state.
    */
  def stampOf(parts: String*): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  /** A published shared root is reusable iff its ok-marker exists AND
    * (when the caller declared expected layouts) every `_LAYOUT` file
    * inside it matches one of them — the verify-on-reuse guard against
    * a cache that predates a layout revision or was damaged in place.
    * A marker-complete root failing the layout check is deleted so the
    * caller rebuilds instead of failing forever.
    */
  private def published(root: Path, expectLayouts: Seq[String]): Boolean = {
    if (!Files.exists(root.resolve(okMarker))) return false
    if (expectLayouts.isEmpty) return true
    val walk = Files.walk(root)
    val ok =
      try walk.filter(p => p.getFileName.toString == "_LAYOUT")
        .allMatch { p =>
          val txt = new String(Files.readAllBytes(p), "UTF-8").trim
          expectLayouts.contains(txt)
        }
      finally walk.close()
    if (!ok) {
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Exception => () } // best-effort; caller rebuilds
    }
    ok
  }

  /** Cross-process content-keyed cache of an IMMUTABLE derived state
    * root — BenchData.realisticCopy's staged-rename publish protocol,
    * generalized (round-11 top item: the five LSM demo-state roots were
    * pid-keyed, so every JVM — each Verify invocation per SF, and the
    * bench — rebuilt ~730 s of one-time state; the states are pure
    * functions of (source bytes, layout, recipe), so one build can be
    * shared by every later process).
    *
    * Key = (kind, source path, source content fingerprint, stamp); the
    * caller folds its layout versions AND a build-recipe string into
    * `stamp` via [[stampOf]] so any code change that alters the built
    * state changes the key. Build goes to a pid-unique staging dir
    * (created by `build` itself — some builders, e.g. snapshot, require
    * a non-existent destination) and publishes by atomic rename:
    * readers only ever see absent or complete. The published copy is
    * NOT registered for shutdown-hook cleanup — sharing it across
    * processes is the point; stale copies of other fingerprints/stamps
    * for the same (kind, path) are pruned here. Callers must treat the
    * returned root as READ-ONLY (clone before mutating).
    */
  def sharedState(kind: String, sfDir: String, stamp: String,
      expectLayouts: Seq[String] = Nil)(build: String => Unit): String = {
    val tmpdir = System.getProperty("java.io.tmpdir")
    val slug = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val shared = Paths.get(
      s"$tmpdir/graft_state_${kind}_${contentTag(sfDir)}_$stamp")
    if (published(shared, expectLayouts)) return shared.toString
    // prune completed caches of OTHER fingerprints/stamps for this
    // (kind, source path) — a rewritten sf dir or revised recipe would
    // otherwise leak its old state forever; in-flight staging dirs are
    // pid-keyed (different name shape) and self-clean on exit.
    // GRACE PERIOD (round 12): a sibling is only pruned once its
    // publish mtime is comfortably older than any plausible run —
    // a still-running process built on an OLD stamp (a different code
    // version running concurrently) would otherwise lose its published
    // root mid-read; after the grace it is a genuinely dead cache
    val sibs = shared.getParent.toFile.listFiles()
    val cutoff = System.currentTimeMillis - pruneGraceMs
    if (sibs != null) sibs.filter { d =>
      d.getName.startsWith(s"graft_state_${kind}_${slug}_") &&
        d.toPath != shared && d.lastModified < cutoff
    }.foreach { d =>
      try Files.walk(d.toPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Exception => () } // best-effort; a losing racer retries
    }
    val t = s"${tag(sfDir)}_$stamp"
    val staging = path(s"state_${kind}_stage", t)
    once(s"state_${kind}_stage:$t") {
      build(staging)
      // marker written LAST (deleting any copy a clone-style build
      // brought along): the rename below can only ever publish a dir
      // that was fully built
      Files.createDirectories(Paths.get(staging))
      Files.deleteIfExists(Paths.get(staging, okMarker))
      Files.createFile(Paths.get(staging, okMarker))
    }
    try {
      Files.move(Paths.get(staging), shared,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      shared.toString
    } catch {
      case _: java.nio.file.FileSystemException =>
        // another process published first (target exists) -> use theirs
        // if complete; else fall back to our own complete staging copy
        if (published(shared, expectLayouts)) shared.toString else staging
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
