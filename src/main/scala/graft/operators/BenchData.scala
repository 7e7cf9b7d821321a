package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Bench-realism inputs. The driver's test parquet has ONE row group per
  * table, so every scan is a single task no matter how
  * `spark.sql.files.maxPartitionBytes` is set — scan parallelism,
  * split packing, and AQE's partition statistics never get exercised,
  * and per-query timings measure a serial scan a real layout would
  * never produce. This helper rewrites every SF-scaled table as a
  * 16-file copy (one row group per file) and symlinks the
  * fixed-cardinality dimension tables unchanged, producing a directory
  * `Tables.load` reads exactly like the source.
  *
  * Used by Bench (and the scan-parallelism spec) only — Verify keeps
  * reading the driver's original layout so oracle runs see identical
  * bytes. Content is identical either way; every query canon-orders its
  * output, so file layout cannot change results.
  */
object BenchData {

  /** Scan-split sizing paired with the multi-file copies (the brief's
    * maxPartitionBytes rule, SF-sized): ONE definition consumed by both
    * Bench and StageProfile's bench-layout mode, so the profiler can
    * never silently profile a different scan shape than the bench
    * times.
    */
  val scanSplitConf: Seq[(String, String)] = Seq(
    "spark.sql.files.maxPartitionBytes" -> "4m",
    "spark.sql.files.openCostInBytes" -> "256k")

  /** AQE partition-coalescing floor, SF-sized like the scan splits
    * (round 15, guide §2.2): with the default
    * `coalescePartitions.minPartitionSize` of 1 MB, parallelism-first
    * coalescing folds a CPU-heavy few-MB shuffle (the positional
    * faces' exploded position rows under their rank windows) into 2-3
    * partitions on a 32-core box — one stage was 60-70% of
    * phrase3_index_match's warmed time. A 256 KB floor lets those
    * shuffles use the cores the box has (still capped by
    * spark.sql.shuffle.partitions). 256 KB and not lower: the round's
    * 64k/256k/1m sweep showed 64 KB splitting the composed faces'
    * many TINY exchanges into dozens of tasks whose scheduling
    * overhead exceeded their work (qlang_index / near_qtag_index
    * regressed 1.5-3x under 64 KB), while 256 KB kept the positional
    * family's win AND those small shuffles at one partition. Scale
    * note: at cluster scale the same stages shuffle GBs and the floor
    * is irrelevant (partition counts are bounded by the initial
    * shuffle partitions long before a 256 KB floor bites) — the
    * default 1 MB is tuned for many-tenant
    * clusters where over-splitting tiny shuffles wastes scheduler
    * throughput, which is not the regime a dedicated bench box is in.
    * Env-overridable so a cluster profile can restore the default
    * without a rebuild.
    */
  val adaptiveConf: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"),
    // codegen class cache sized to the registry, not to a
    // single-query app (round 15): the default 100-entry LRU thrashes
    // under 184 queries whose composed faces each carry dozens of
    // whole-stage/subexpression codegen units — a big-plan query can
    // evict its own entries within one run and pay seconds of Janino
    // recompilation per execution (observed as nondeterministic
    // 2-3x spikes on whichever composed face ran after other big
    // plans). Static conf, so it must be set before the session is
    // created; memory cost is bounded by generated-class bytecode
    // (tens of MB at 5000 entries).
    "spark.sql.codegen.cache.maxEntries" ->
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
    // constraint propagation is superlinear in plan size and the
    // composed retrieval faces carry 200-300 KB formatted plans — the
    // rule burned optimizer time on every run AND inserted redundant
    // inferred predicates into the executed plan (qlang_index warmed
    // ~30% faster without it; the 6-way-join sales_rollup measured
    // flat-to-better, and every inferred constraint is semantically
    // redundant by construction, so results cannot change — the
    // oracle gate re-verified 184/184 with it off). Scale note: the
    // optimizer cost is driver-side and single-threaded, so giant
    // plans pay it identically on a cluster (guide §7.3); flip the
    // env var for workloads whose scans depend on inferred
    // join-key IsNotNull pruning.
    "spark.sql.constraintPropagation.enabled" ->
      sys.env.getOrElse("SPARK_GRAFT_CONSTRAINT_PROP", "false"))

  /** Every SF-scaled table — TPC-H facts AND the text/vector corpora
    * (documents/embeddings feed the top-cost dedup/ANN queries; leaving
    * them single-file would keep exactly the serial-scan artifact this
    * helper removes). Fixed-cardinality dims stay symlinked.
    */
  private val scaled = Set("lineitem", "orders", "events", "documents", "embeddings")

  /** Files per rewritten table: enough that a 32-thread local session
    * gets real multi-task scans once maxPartitionBytes is sized to the
    * SF.
    */
  val filesPerFact = 16

  /** Marker file that publishes a cache dir as complete: written LAST
    * into staging, so its presence in the content-keyed path proves the
    * atomic rename moved a fully-built copy.
    */
  private val okMarker = "_GRAFT_COPY_OK"

  def realisticCopy(spark: SparkSession, sfDir: String): String = {
    // Cross-process cache keyed on (source path, content fingerprint):
    // the copy is a pure function of the input bytes, and rebuilding it
    // on every JVM launch cost the round-4 driver bench minutes of its
    // wall budget before the first query ran. A later source rewrite
    // changes the fingerprint -> new key -> fresh build; the stale dir
    // is pruned below.
    val tmpdir = System.getProperty("java.io.tmpdir")
    val dirSlug = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val cacheRoot = Paths.get(s"$tmpdir/graft_bench_cache_${TmpData.contentTag(sfDir)}")
    if (Files.exists(cacheRoot.resolve(okMarker))) return cacheRoot.toString
    // prune completed caches of OTHER fingerprints for this source path
    // (a rewritten sf dir would otherwise leak its old copy forever);
    // in-flight staging dirs are pid-keyed and self-clean on exit
    val sibs = cacheRoot.getParent.toFile.listFiles()
    if (sibs != null) sibs.filter { d =>
      d.getName.startsWith(s"graft_bench_cache_${dirSlug}_") &&
        d.toPath != cacheRoot
    }.foreach { d =>
      try Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Exception => () } // best-effort; a losing racer retries
    }
    // build into a pid-unique staging dir (no concurrent-JVM races),
    // publish by atomic rename: readers only ever see absent or complete
    val t = TmpData.tag(sfDir)
    val staging = TmpData.path("bench_stage", t)
    TmpData.once(s"bench_stage:$t") {
      Files.createDirectories(Paths.get(staging))
      val listed = new java.io.File(sfDir).listFiles()
      require(listed != null, s"dataset directory not found or unreadable: $sfDir")
      val srcFiles = listed.toSeq
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      for (f <- srcFiles) {
        val table = f.getName.stripSuffix(".parquet")
        if (scaled(table)) {
          // events.ts has shipped in several on-disk encodings; decode
          // through the same adaptive path readers use (Tables.loadEvents)
          // and write the copy as plain TimestampType parquet, which that
          // same path reads back — the copy never depends on which
          // generation of writer produced the source
          val df =
            if (table == "events")
              graft.Tables.loadEvents(spark, f.getPath)
            else spark.read.parquet(f.getPath)
          // round-robin repartition writes exactly filesPerFact files
          // (one row group each) without the extra count() scan a
          // maxRecordsPerFile sizing would need; row order changes,
          // content does not, and every query canon-orders its output
          df.repartition(filesPerFact).write.mode("overwrite")
            .parquet(s"$staging/${f.getName}")
        } else {
          // idempotent like the parquet side's mode("overwrite"): a
          // retried write block (once() only marks AFTER success) or a
          // stale tmp dir from a killed run must not die on an existing
          // link
          val link = Paths.get(staging, f.getName)
          Files.deleteIfExists(link)
          // absolute target: a relative SPARK_GRAFT_SF_DIR would
          // otherwise store a link that resolves against /tmp and dangles
          Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
        }
      }
      // marker written LAST: rename below can only ever publish a dir
      // that already contains it
      Files.createFile(Paths.get(staging, okMarker))
    }
    try {
      Files.move(Paths.get(staging), cacheRoot,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      cacheRoot.toString
    } catch {
      case _: java.nio.file.FileSystemException =>
        // another process published first (target exists) -> use theirs
        // if complete; else fall back to our own complete staging copy
        if (Files.exists(cacheRoot.resolve(okMarker))) cacheRoot.toString
        else staging
    }
  }
}
