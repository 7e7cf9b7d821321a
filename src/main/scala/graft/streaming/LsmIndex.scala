package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Shared machinery for LSM-shaped streaming state: a state root holding
  * one or more sub-tables, each hash-partitioned on fixed columns with
  * per-micro-batch `ingest=<batchId>` generation dirs appended by the
  * stream and consolidated by maintenance compaction.
  *
  * Contracts factored here (identical across the document near-dup gate
  * and the embedding near-dup gate):
  *  - layout version marker: `_LAYOUT` stamped on first touch; a
  *    mismatching or missing marker over pre-existing state FAILS FAST
  *    instead of silently mis-pruning a foreign-layout index;
  *  - generation accounting: generations-per-partition-dir is the read
  *    amplification factor of a candidate lookup, so the compaction
  *    cadence rule "compact when the worst partition holds ≥ G
  *    generations" bounds candidate reads to ≤ G files per touched
  *    partition dir at all times;
  *  - compaction: one read→consolidate→swap job per sub-table (never a
  *    per-partition driver loop), verify-then-swap staging so a crash
  *    leaves both the old and new state on disk, dedup on merge so a
  *    batch re-delivered after its generation was already merged
  *    converges.
  */
private[graft] object LsmIndex {

  /** One sub-table of an LSM state root: its dir name, full stored
    * schema (data + hash partition columns + `ingest`), the hash
    * partition columns (everything but `ingest` that partitions dirs),
    * and optional within-file sort columns — declared here so
    * compaction PRESERVES the sort the stream's folds establish (tight
    * parquet row-group stats are what keep point-lookup pushdown
    * candidate-bounded on the merged files).
    */
  final case class Sub(name: String, schema: StructType,
      hashCols: Seq[String], sortCols: Seq[String] = Nil)

  private[streaming] val layoutMarker = "_LAYOUT"

  /** Repair the on-disk effects of a compaction crash BEFORE any read
    * or write touches the sub-tables (ADVICE r8: compact()'s old
    * contract left a window — between rename(root→retired) and
    * rename(staging→root) — where the sub-table root was MISSING, so
    * readOrEmpty silently served an empty index, and the next compact
    * deleted the retired copy that documented "manual recovery").
    * Called from [[ensureLayout]], i.e. on every state touch:
    *  - root missing + retired present → the swap crashed mid-way:
    *    restore the retired (pre-compaction) root — the staging copy,
    *    even when complete, is redundant with it (compaction is a pure
    *    rewrite) and is deleted so the next compaction starts clean;
    *  - root present → any staging/retired leftovers are from an
    *    incomplete staging build or a completed swap: delete both;
    *  - root missing + staging present + retired missing → cannot
    *    arise from compact()'s ordering (retired is deleted only after
    *    staging was renamed in); refuse to guess.
    */
  private def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, subNames: Seq[String]): Unit = {
    for (sub <- subNames) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/$sub")
      val staging = new org.apache.hadoop.fs.Path(
        s"$stateDir/${sub}_compact_staging")
      val retired = new org.apache.hadoop.fs.Path(
        s"$stateDir/${sub}_pre_compact")
      if (!fs.exists(root) && fs.exists(retired)) {
        require(fs.rename(retired, root),
          s"compaction-crash recovery: rename $retired -> $root failed")
        fs.delete(staging, true)
      } else if (fs.exists(root)) {
        fs.delete(staging, true)
        fs.delete(retired, true)
      } else {
        require(!fs.exists(staging),
          s"state at $stateDir has an orphan compaction staging dir " +
            s"($staging) with neither a live nor a retired $sub root — " +
            "refusing to guess which copy is authoritative")
      }
    }
  }

  def ensureLayout(spark: SparkSession, stateDir: String,
      version: String, subNames: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(conf)
    // an interrupted MIGRATION (see migrate) leaves sibling dirs whose
    // presence means the state root itself may be missing or half-new;
    // only migrate() knows how to finish or roll back — fail fast here
    require(!fs.exists(new org.apache.hadoop.fs.Path(
        stateDir + "_pre_migrate")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(
        stateDir + "_migrate_staging")),
      s"index at $stateDir has an interrupted layout migration " +
        "(sibling _pre_migrate/_migrate_staging dirs) — rerun the " +
        "gate's migrateState to complete or roll it back")
    recoverCompaction(fs, stateDir, subNames)
    val marker = new org.apache.hadoop.fs.Path(root, layoutMarker)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val found =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(found == version,
        s"index at $stateDir has layout '$found' but this build expects " +
          s"'$version' — refusing to read it (silent mis-pruning); " +
          "recompact/migrate the index or point at a fresh dir")
    } else {
      val preExisting = subNames.exists(s =>
        fs.exists(new org.apache.hadoop.fs.Path(root, s)))
      require(!preExisting,
        s"index at $stateDir predates layout markers (no $layoutMarker " +
          "file) — refusing to guess its layout; migrate it or point at " +
          "a fresh dir")
      fs.mkdirs(root)
      val out = fs.create(marker, false)
      try out.write(version.getBytes("UTF-8")) finally out.close()
    }
  }

  def readOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Worst-case generations per hash-partition dir across the
    * sub-tables — the read-amplification factor of the next candidate
    * lookup. Pure driver-side listing of a fixed dir domain, no Spark
    * job.
    */
  def maxGenerations(spark: SparkSession, stateDir: String,
      subNames: Seq[String]): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    var worst = 0
    for (sub <- subNames) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/$sub")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        def walk(p: org.apache.hadoop.fs.Path): Unit = {
          val dirs = fs.listStatus(p).toSeq.filter(_.isDirectory)
          val gens = dirs.count(_.getPath.getName.startsWith("ingest="))
          if (gens > 0) worst = math.max(worst, gens)
          else dirs.foreach(d => walk(d.getPath))
        }
        walk(root)
      }
    }
    worst
  }

  /** Hash-partition dirs of a sub-table root = parents of `ingest=*`
    * generation dirs. Driver-side listing of the fixed dir domain.
    */
  private def partDirsOf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val dirs = fs.listStatus(p).toSeq.filter(_.isDirectory)
    if (dirs.exists(_.getPath.getName.startsWith("ingest="))) Seq(p)
    else dirs.flatMap(d => partDirsOf(fs, d.getPath))
  }

  private def dataFilesOf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val st = fs.listStatus(p).toSeq
    st.filter(s => s.isFile && s.getPath.getName.startsWith("part-")) ++
      st.filter(_.isDirectory).flatMap(d => dataFilesOf(fs, d.getPath))
  }

  /** Operational DESCRIBE of a state root — the maintenance dashboard
    * an operator reads before deciding to compact, re-domain, migrate,
    * or investigate: per-sub-table logical generations / partition
    * dirs / data files / bytes (driver-side FS metadata only, bounded
    * by dir domain × generations — the same listings every query face
    * already pays; NO data is read), the corpus constants from the
    * markers, the ledger position (operations recorded, last seq,
    * compaction barriers), the registered pins, and the stamped
    * layout. Rows are (section, name, value, text): numeric facts
    * carry `value`, the layout string rides `text`.
    */
  def stats(spark: SparkSession, stateDir: String, subNames: Seq[String],
      markerVals: Seq[(String, Long)]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, java.lang.Long, String)]
    def add(sec: String, name: String, v: Long): Unit =
      rows += ((sec, name, java.lang.Long.valueOf(v), null))
    for (sub <- subNames) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/$sub")
      val fs = root.getFileSystem(conf)
      val sec = s"sub:$sub"
      if (!fs.exists(root)) add(sec, "generations", 0L)
      else {
        val parts = partDirsOf(fs, root)
        val gens = parts.flatMap(p => fs.listStatus(p).toSeq
          .filter(_.isDirectory).map(_.getPath.getName)
          .filter(_.startsWith("ingest="))).distinct
        val files = dataFilesOf(fs, root)
        add(sec, "generations", gens.size.toLong)
        add(sec, "part_dirs", parts.size.toLong)
        add(sec, "files", files.size.toLong)
        add(sec, "bytes", files.map(_.getLen).sum)
      }
    }
    markerVals.foreach { case (n, v) => add("corpus", n, v) }
    val es = OpLog(stateDir).entries(spark)
    add("ledger", "entries", es.size.toLong)
    if (es.nonEmpty) add("ledger", "last_seq", es.map(_._1).max)
    add("ledger", "compactions", es.count(_._2 == "compact").toLong)
    val pinsDir = new org.apache.hadoop.fs.Path(s"$stateDir/pins")
    val pfs = pinsDir.getFileSystem(conf)
    val nPins = if (!pfs.exists(pinsDir)) 0L
      else pfs.listStatus(pinsDir).count(st =>
        st.isFile && st.getPath.getName.startsWith("pin_")).toLong
    add("pins", "registered", nPins)
    Pins(stateDir).minSeq(spark)
      .foreach(s => add("pins", "min_seq", s))
    // maintenance report (round 13): how many cron cycles ran, what
    // the last one did — the DESCRIBE-grain view of the maintlog
    val ml = MaintLog(stateDir).entries(spark)
    add("maintenance", "cycles", ml.size.toLong)
    ml.lastOption.foreach { case (_, seq, m) =>
      add("maintenance", "last_seq", seq)
      add("maintenance", "last_acted", if (m.any) 1L else 0L)
      if (m.driftMicro >= 0L)
        add("maintenance", "last_drift_micro", m.driftMicro)
    }
    readLayout(spark, stateDir).foreach(l =>
      rows += (("layout", "version", null, l)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq.map {
        case (sec, n, v, t) => org.apache.spark.sql.Row(sec, n, v, t)
      }, 1),
      StructType(Seq(
        StructField("section", StringType),
        StructField("name", StringType),
        StructField("value", LongType),
        StructField("text", StringType))))
  }

  /** The sub-tables a [[compact]] call at `minFiles` would rewrite —
    * same fragmentation rule, driver-side listing only. Gates use it to
    * decide whether maintenance will do any work BEFORE recording the
    * epoch barrier (ADVICE r10: a no-op maintenance call must not seal
    * snapshot history, and the barrier must precede a real merge).
    */
  def fragmentedSubs(spark: SparkSession, stateDir: String,
      subs: Seq[Sub], minFiles: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    subs.filter { sub =>
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/${sub.name}")
      val fs = root.getFileSystem(conf)
      fs.exists(root) && partDirsOf(fs, root)
        .exists(pd => dataFilesOf(fs, pd).size >= minFiles)
    }.map(_.name)
  }

  /** The LSM compaction: consolidate each sub-table's `ingest=`
    * generations into a single deduped `ingest=-1` generation sized to
    * `targetFileBytes`, as ONE read→write job per sub-table. Runs only
    * if some partition dir holds ≥ `minFiles` data files. Returns
    * (fragmentedPartitionsBefore, filesBefore, filesAfter).
    *
    * Crash contract: staging write + row-count verify BEFORE any
    * delete; the window between moving the old root aside and renaming
    * the staging in is a read hole, not data loss (both dirs survive
    * for manual recovery). Run it against a CLEANLY STOPPED stream —
    * compacting an uncommitted batch's generation away lets its
    * re-delivery re-append rows the merged generation already holds
    * (read-side distinct()s keep that correct; the duplicate bytes
    * persist until the next compaction).
    *
    * `transforms` (per sub-table name) rewrite the merged relation
    * before it is written back — the gates' hook for folding LOGICAL
    * state into the physical layout at compaction time (IndexStream
    * applies tombstone deletes here: postings/docs anti-joined, dfs
    * re-aggregated to survivor counts). A transformed sub-table must
    * keep its declared schema minus `ingest`. `force` names sub-tables
    * that must rewrite even when not fragmented — a caller whose
    * transforms carry a cross-sub invariant (tombstones may only be
    * cleared once EVERY data sub-table was rewritten) uses it to keep
    * the rewrites atomic per compaction run rather than
    * per-fragmentation-accident.
    */
  def compact(spark: SparkSession, stateDir: String, subs: Seq[Sub],
      targetFileBytes: Long, minFiles: Int,
      transforms: Map[String, DataFrame => DataFrame] = Map.empty,
      force: Set[String] = Set.empty): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val conf = spark.sparkContext.hadoopConfiguration
    var parts = 0; var before = 0; var after = 0
    for (sub <- subs) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/${sub.name}")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        def dataFiles(p: org.apache.hadoop.fs.Path) = dataFilesOf(fs, p)
        val fragmented = partDirsOf(fs, root)
          .map(pd => dataFiles(pd).size).count(_ >= minFiles)
        if (fragmented > 0 || force.contains(sub.name)) {
          val files = dataFiles(root)
          val dataCols = sub.schema.fieldNames.toSeq
            .filterNot(sub.hashCols.contains).filterNot(_ == "ingest")
          val merged = spark.read.schema(sub.schema).parquet(root.toString)
            .select((dataCols ++ sub.hashCols).map(col): _*)
          val src = transforms.get(sub.name).map(_(merged)).getOrElse(merged)
            .select((dataCols ++ sub.hashCols).map(col): _*).distinct()
          val expected = src.count()
          val totalBytes = files.map(_.getLen).sum
          val nOut = math.max(1L,
            (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
          val staging = new org.apache.hadoop.fs.Path(
            s"$stateDir/${sub.name}_compact_staging")
          val retired = new org.apache.hadoop.fs.Path(
            s"$stateDir/${sub.name}_pre_compact")
          fs.delete(staging, true); fs.delete(retired, true)
          // repartition on the hash columns so each partition dir gets
          // ~one file per output task that holds it, not task-count
          // many; re-establish the declared within-file sort so merged
          // row groups keep tight stats
          val parted = src.repartition(nOut, sub.hashCols.map(col): _*)
          val sorted =
            if (sub.sortCols.isEmpty) parted
            else parted.sortWithinPartitions(
              (sub.hashCols ++ sub.sortCols).map(col): _*)
          sorted.withColumn("ingest", lit(-1L))
            .write.partitionBy((sub.hashCols :+ "ingest"): _*)
            .parquet(staging.toString)
          val got =
            spark.read.schema(sub.schema).parquet(staging.toString).count()
          require(got == expected,
            s"compaction staging lost rows ($got != $expected) for $root; " +
              "original untouched")
          require(fs.rename(root, retired), s"rename $root -> $retired failed")
          require(fs.rename(staging, root), s"rename $staging -> $root failed")
          fs.delete(retired, true)
          // a caller-persisted plan over this sub-table (the gates'
          // query faces use the caller-owned cache lifecycle) would
          // otherwise recompute from the replaced part files on its
          // next partial materialization — invalidate and let it
          // re-list
          spark.catalog.refreshByPath(root.toString)
          parts += fragmented; before += files.size
          after += dataFiles(root).size
        }
      }
    }
    (parts, before, after)
  }

  /** EMISSION-LOG COMPACTION (round 11, roadmap item): the gates'
    * flagged-pair logs are written `outDir/batch_id=<id>/` — one dir
    * per micro-batch, forever — so a long-lived stream's verdict reads
    * ([[KeepResolve]] over the log) pay a file-listing fan-in linear
    * in BATCH COUNT, not data size: the same generation-count pressure
    * [[compact]] bounds for state sub-tables, one level up.
    *
    * This pass consolidates every `batch_id=` partition into a single
    * deduped `batch_id=-1` partition (the `ingest=-1` convention),
    * sized to `targetFileBytes`, under [[compact]]'s exact crash
    * contract: staging write + row-count verify BEFORE any delete,
    * then the two-rename swap. The ORIGINAL batch ids are physical
    * idempotence keys, not data — every consumer either aggregates
    * over the whole log (KeepResolve min-partner, the verdict flags,
    * the drop sets — all duplicate-tolerant) or filters to the
    * CURRENT batch's freshly-written partition; like [[compact]], run
    * it between stream runs against a cleanly stopped checkpoint. A
    * batch re-delivered AFTER its partition was consolidated away
    * re-emits under its own `batch_id=` (the gates recompute the same
    * pairs against the accumulated state) and the read-side
    * duplicate tolerance converges — the duplicate bytes persist
    * until the next consolidation, exactly the state sub-tables'
    * re-delivery-after-compaction story.
    *
    * Returns (batchDirsBefore, filesBefore, filesAfter); (0, 0, 0)
    * when fewer than `minDirs` partitions exist (no-op — bounding a
    * one-batch log would only churn bytes).
    */
  def compactEmissions(spark: SparkSession, outDir: String,
      schema: StructType, targetFileBytes: Long,
      minDirs: Int = 2): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0, 0, 0)
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    if (dirs.size < minDirs) return (0, 0, 0)
    val files = dataFilesOf(fs, root)
    val dataCols = schema.fieldNames.toSeq.filterNot(_ == "batch_id")
    // distinct over the DATA columns: a pair is emitted exactly once —
    // in the batch its new_id arrived (HiWater forbids re-arrival), so
    // the only collapsible duplicates are replay copies of the same row
    val merged = spark.read.schema(schema).parquet(outDir)
      .select(dataCols.map(col): _*).distinct()
    val expected = merged.count()
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val staging = new org.apache.hadoop.fs.Path(outDir + "_compact_staging")
    val retired = new org.apache.hadoop.fs.Path(outDir + "_pre_compact")
    fs.delete(staging, true); fs.delete(retired, true)
    merged.repartition(nOut)
      .sortWithinPartitions(dataCols.map(col): _*)
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").parquet(staging.toString)
    val got = spark.read.schema(schema).parquet(staging.toString).count()
    require(got == expected,
      s"emission compaction staging lost rows ($got != $expected) for " +
        s"$outDir; original untouched")
    require(fs.rename(root, retired), s"rename $root -> $retired failed")
    require(fs.rename(staging, root), s"rename $staging -> $root failed")
    fs.delete(retired, true)
    spark.catalog.refreshByPath(outDir)
    (dirs.size, files.size, dataFilesOf(fs, root).size)
  }

  /** The stamped layout version of a state root, if any. */
  def readLayout(spark: SparkSession, stateDir: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(stateDir, layoutMarker)
    val fs = marker.getFileSystem(conf)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** LAYOUT MIGRATION: rebuild a state root under a new `_LAYOUT`
    * version from its layout-stable RAW columns, converting the
    * fail-fast wall in [[ensureLayout]] into a supported operation
    * (r8 verdict top item: the only remedy it offered was "point at a
    * fresh dir", i.e. re-indexing the corpus).
    *
    * The caller supplies `rebuild(oldRoot, stagingRoot)`: read whatever
    * survives any layout (the gates' raw sub-tables — `vecs.v`,
    * `docs.lt` — keep their data columns across every layout revision)
    * and write the complete NEW state under `stagingRoot`. This
    * function owns the transactional shell:
    *
    *  1. recovery of a previously-interrupted migration — between the
    *     two swap renames the staging root is complete and verified, so
    *     the swap is FINISHED (rename staging in, drop the retired
    *     copy); with the live root intact, stale staging/retired
    *     leftovers are deleted and the migration restarts;
    *  2. no-op when the stamped version already equals `toVersion`;
    *  3. rebuild into `<stateDir>_migrate_staging`, stamp the new
    *     marker there (the staging root is a complete, openable state
    *     dir before the swap begins);
    *  4. swap: rename(root → `<stateDir>_pre_migrate`),
    *     rename(staging → root), delete retired. A crash at any point
    *     leaves either the old root or a complete new root reachable
    *     by this recovery; concurrent readers are kept out by
    *     ensureLayout's fail-fast on the sibling dirs.
    *
    * Returns true when a migration (or its crash-recovery completion)
    * ran, false on the version-match no-op.
    */
  def migrate(spark: SparkSession, stateDir: String, toVersion: String)(
      rebuild: (String, String) => Unit): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(stateDir + "_migrate_staging")
    val retired = new org.apache.hadoop.fs.Path(stateDir + "_pre_migrate")
    // a session that read the pre-migration files caches their leaf
    // listings keyed by SUB-TABLE path (readOrEmpty roots there), so
    // the post-swap invalidation must hit each sub-table dir — the
    // root-path refresh alone leaves stale listings chasing deleted
    // files (surfaced by LifecycleSoakSpec's compact-then-migrate
    // sequence; same contract as compact()'s per-sub refresh)
    def refreshSubs(): Unit = {
      spark.catalog.refreshByPath(stateDir)
      if (fs.exists(root))
        for (st <- fs.listStatus(root) if st.isDirectory)
          spark.catalog.refreshByPath(st.getPath.toString)
    }
    if (!fs.exists(root) && fs.exists(retired)) {
      if (fs.exists(staging) &&
        readLayout(spark, staging.toString).contains(toVersion)) {
        // crashed between the swap renames with a complete staging:
        // finish the swap
        require(fs.rename(staging, root),
          s"migration recovery: rename $staging -> $root failed")
        fs.delete(retired, true)
        refreshSubs()
        return true
      }
      // staging absent or not stamped ⇒ the swap never started (the
      // retired rename is the FIRST swap step and staging is stamped
      // before it) — cannot arise from this protocol; roll back to the
      // old root rather than guess
      require(fs.rename(retired, root),
        s"migration recovery: rename $retired -> $root failed")
      fs.delete(staging, true)
    }
    require(fs.exists(root),
      s"cannot migrate $stateDir: no state root exists")
    val found = readLayout(spark, stateDir).getOrElse(
      throw new IllegalArgumentException(
        s"cannot migrate $stateDir: it has no $layoutMarker marker — " +
          "its layout is unknown and rebuilding from raw columns could " +
          "misread them"))
    if (found == toVersion) { fs.delete(staging, true); return false }
    fs.delete(staging, true); fs.delete(retired, true)
    rebuild(stateDir, staging.toString)
    fs.mkdirs(staging) // a rebuild of EMPTY state writes no sub-tables
    // carry the operation ledger into the new root so seq numbers stay
    // unique across the state's whole lifetime (ADVICE r10: replacing
    // the root used to restart seqs at 1, so an externally recorded
    // pin silently referred to different history after a migration),
    // and record the migration itself as an epoch barrier — the
    // rebuild consolidated everything into ingest=-1, so pre-migration
    // seqs are no longer addressable and snapshot() must fail fast on
    // them instead of materializing empty state
    // the maintenance report log rides along for the same reason: the
    // operational history must survive the root swap
    for (carry <- Seq("oplog", "maintlog")) {
      val src = new org.apache.hadoop.fs.Path(s"$stateDir/$carry")
      if (fs.exists(src))
        require(org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
          new org.apache.hadoop.fs.Path(staging, carry), false, true,
          spark.sparkContext.hadoopConfiguration),
          s"migration $carry carry failed: $src")
    }
    val slog = OpLog(staging.toString)
    slog.record(spark, "migrate",
      slog.entries(spark).count(_._2 == "migrate").toLong)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(staging, layoutMarker), true)
    try out.write(toVersion.getBytes("UTF-8")) finally out.close()
    require(fs.rename(root, retired), s"rename $root -> $retired failed")
    require(fs.rename(staging, root), s"rename $staging -> $root failed")
    fs.delete(retired, true)
    refreshSubs()
    true
  }

  /** ID-MONOTONICITY high-water markers (round 10, verdict item 3):
    * the dedup gates' keep-at-ingest finality — and therefore the
    * soundness of the composed pipeline (PipelineStream) — rests on
    * ids increasing with arrival order: both gates emit only
    * (dup_id < new_id) pairs, so "kept when its batch landed" is final
    * only if no LATER batch can carry a smaller id. That contract was
    * stated and relied upon but never checked; a source violating it
    * silently broke finality (a later batch could flag an
    * already-indexed doc whose vocabulary then stayed searchable).
    *
    * One tiny `ingest=<batchId>` file per ingested batch holds the
    * batch's max id. [[checkMonotone]] fails fast when a batch with a
    * NEW batch id (greater than every recorded one) carries a min id
    * at or below the recorded high water; a batch whose id is ≤ some
    * recorded marker is a REPLAY (the streaming runner re-delivers
    * uncommitted batches, and maintenance probes in the scale specs
    * re-use old ids) and is exempt — replays are keyed overwrites of
    * their own generation, which cannot break finality.
    *
    * Crash contract is simpler than [[Markers]]: the merged quantity
    * is a MAX, so [[consolidate]] can write the merged marker (named
    * with the largest merged batch id, preserving replay detection)
    * before deleting the inputs — any crash leaves a superset of
    * markers whose max is unchanged. Torn or unparsable files are
    * skipped (the check degrades to conservative-skip, never a false
    * failure).
    */
  final case class HiWater(stateDir: String) {
    private def dir = new org.apache.hadoop.fs.Path(s"$stateDir/hiwater")

    private def fsOf(spark: SparkSession) =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** (batchId, maxId) per parsable marker. */
    private def entries(spark: SparkSession): Seq[(Long, Long)] = {
      val fs = fsOf(spark)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && st.getPath.getName.startsWith("ingest=")).flatMap { st =>
        val in = fs.open(st.getPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        try Some((st.getPath.getName.stripPrefix("ingest=").toLong,
          txt.toLong))
        catch { case _: NumberFormatException => None }
      }
    }

    def record(spark: SparkSession, batchId: Long, maxId: Long): Unit = {
      val fs = fsOf(spark)
      fs.mkdirs(dir)
      val f = new org.apache.hadoop.fs.Path(dir, s"ingest=$batchId")
      val tmp = new org.apache.hadoop.fs.Path(dir, s"_tmp_ingest_$batchId")
      fs.delete(tmp, false)
      val out = fs.create(tmp, true)
      try out.write(maxId.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(f, false)
      require(fs.rename(tmp, f), s"hiwater publish rename $tmp -> $f failed")
    }

    /** The high water a genuinely-NEW batch must stay above, or None
      * when the check does not apply: a replay (some recorded batch id
      * ≥ this one — the streaming runner's re-delivery path) or a
      * state with no markers yet (pre-round-10 state migrates its
      * water in via migrateState).
      *
      * The gates' refined rule (see their applyBatch): ids ≤ the high
      * water are allowed ONLY when already indexed — a re-arrival of
      * the same row (at-least-once sources duplicate rows across batch
      * boundaries) compares against exactly its original comparison
      * set, because everything ingested after it carries higher ids,
      * so its verdict cannot change. A sub-water id NOT in the index
      * is the violation finality cannot survive.
      */
    def highWaterFor(spark: SparkSession, batchId: Long): Option[Long] = {
      val es = entries(spark)
      if (es.exists(_._1 >= batchId)) None
      else es.map(_._2).maxOption
    }

    /** The fail-fast message (shared so both gates report identically). */
    def violationMsg(batchId: Long, id: Long, high: Long): String =
      s"id-monotonicity violation at $stateDir: batch $batchId " +
        s"carries NEW id $id ≤ the recorded high water $high — the " +
        "gates' keep-at-ingest finality (dup_id < new_id with ids " +
        "increasing in arrival order) does not hold for this source, " +
        "so verdicts already issued could be invalidated. Re-key the " +
        "source with arrival-ordered ids."

    /** Merge every marker into one file named with the LARGEST merged
      * batch id (so replay detection survives consolidation) holding
      * the max id.
      */
    def consolidate(spark: SparkSession): Unit = {
      val fs = fsOf(spark)
      val es = entries(spark)
      if (es.size > 1) {
        val bid = es.map(_._1).max
        val high = es.map(_._2).max
        record(spark, bid, high)
        for (st <- fs.listStatus(dir)
            if st.isFile && st.getPath.getName.startsWith("ingest=") &&
              st.getPath.getName != s"ingest=$bid")
          fs.delete(st.getPath, false)
      }
    }
  }

  /** Per-generation count markers under `<stateDir>/<name>/`: one tiny
    * `ingest=<batchId>` file per ingested batch holding that batch's
    * counts as comma-separated longs. [[stored]] element-wise-sums
    * them, so a gate's sizing/corpus-stat reads are O(generations)
    * driver-side file reads bounded by the compaction cadence — never
    * a data scan of the index (Spark does not serve count(*) from
    * parquet footers by default, so counting a sub-table would scan
    * data proportional to the index and break the O(batch) per-batch
    * cost contract). A re-delivered batch OVERWRITES its own marker
    * (idempotent); a crash between a data fold and its marker write
    * undercounts until the retry heals it — conservative for every
    * current use (log₂ sizing, BM25 idf).
    *
    * [[consolidate]] swaps the marker set for one merged `ingest=-1`
    * file via a whole-dir staging swap (crash-safe: no window sums old
    * and merged markers together; between the renames the live dir is
    * briefly absent and [[stored]] reads zeros — conservative — until
    * [[recover]] restores it on the next state touch). Factored here
    * from VecDupStream (round 9) so every marker-carrying gate shares
    * one crash contract.
    */
  /** Operation LEDGER of a state root: one tiny file per
    * state-mutating operation under `oplog/`, named by the operation's
    * IDENTITY (`op_<kind>_<id>`) and holding its SEQUENCE number —
    * assigned at first record and STABLE under re-delivery (the same
    * keyed idempotence every state write relies on). The ledger gives
    * the generation dirs a total order: fold and delete generations
    * live in disjoint numeric namespaces (batchId ≥ 0 vs −(2+deleteId)),
    * so "the state as of operation T" is not well-defined from dir
    * names alone. Compactions record as epoch BARRIERS: they merge all
    * earlier generations into `ingest=-1`, so history strictly before
    * the latest barrier stops being addressable — a snapshot reader
    * fails fast instead of guessing.
    *
    * Crash contract: the ledger entry is written AFTER the operation's
    * state writes commit; a crash between them means the operation is
    * absent from the ledger until its retry re-records it (keyed
    * overwrite — same seq if the file landed, next seq otherwise;
    * either way the retry that completes the state also completes the
    * ledger). Writes are tmp+rename; unparsable files are skipped.
    */
  final case class OpLog(stateDir: String) {
    private def dir = new org.apache.hadoop.fs.Path(s"$stateDir/oplog")

    private def fsOf(spark: SparkSession) =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** (seq, kind, id), ascending by seq. */
    def entries(spark: SparkSession): Seq[(Long, String, Long)] = {
      val fs = fsOf(spark)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && st.getPath.getName.startsWith("op_")).flatMap { st =>
        val parts = st.getPath.getName.stripPrefix("op_").split("_", 2)
        val in = fs.open(st.getPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        try
          if (parts.length == 2) Some((txt.toLong, parts(0), parts(1).toLong))
          else None
        catch { case _: NumberFormatException => None }
      }.sortBy(_._1)
    }

    /** Record an operation; idempotent on (kind, id) — re-delivery
      * returns the originally assigned seq. Returns the seq.
      */
    def record(spark: SparkSession, kind: String, id: Long): Long = {
      require(!kind.contains("_"), s"op kind must not contain '_': $kind")
      val fs = fsOf(spark)
      fs.mkdirs(dir)
      val f = new org.apache.hadoop.fs.Path(dir, s"op_${kind}_$id")
      if (fs.exists(f)) {
        val in = fs.open(f)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        try return txt.toLong
        catch { case _: NumberFormatException => () } // torn: re-assign
      }
      val seq = entries(spark).map(_._1).maxOption.getOrElse(0L) + 1L
      val tmp = new org.apache.hadoop.fs.Path(dir, s"_tmp_op_${kind}_$id")
      fs.delete(tmp, false)
      val out = fs.create(tmp, true)
      try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(f, false)
      require(fs.rename(tmp, f), s"oplog publish rename $tmp -> $f failed")
      seq
    }
  }

  /** REPRODUCIBILITY PINS (round 11): a tiny named-file registry under
    * `pins/` — `pin_<name>` holding a ledger seq — that maintenance
    * respects: [[gensAsOf]]-addressable history a registered pin still
    * wants must not be sealed, so the gates' compactState is a no-op
    * while any pin addresses recorded history (every compaction
    * barrier gets a seq above ALL current seqs, so it would seal every
    * registered pin). The operator's flow: register the pin when a
    * training run starts, snapshot or as-of-query it at will, release
    * it when the run's provenance window closes — then compaction
    * proceeds and the normal barrier fail-fast applies to the stale
    * seq. Same tmp+rename publish and unparsable-skip tolerance as the
    * other marker files.
    */
  final case class Pins(stateDir: String) {
    private def dir = new org.apache.hadoop.fs.Path(s"$stateDir/pins")

    private def fsOf(spark: SparkSession) =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def register(spark: SparkSession, name: String, seq: Long): Unit = {
      require(name.nonEmpty && !name.contains("/"),
        s"pin name must be a plain token: '$name'")
      val fs = fsOf(spark)
      fs.mkdirs(dir)
      val f = new org.apache.hadoop.fs.Path(dir, s"pin_$name")
      val tmp = new org.apache.hadoop.fs.Path(dir, s"_tmp_pin_$name")
      fs.delete(tmp, false)
      val out = fs.create(tmp, true)
      try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(f, false)
      require(fs.rename(tmp, f), s"pin publish rename $tmp -> $f failed")
    }

    def release(spark: SparkSession, name: String): Unit = {
      val fs = fsOf(spark)
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"pin_$name"), false)
      ()
    }

    /** The lowest registered pin seq, if any (unparsable files are
      * skipped — a torn pin write must not wedge maintenance forever,
      * and the re-register heals it).
      */
    def minSeq(spark: SparkSession): Option[Long] = {
      val fs = fsOf(spark)
      if (!fs.exists(dir)) None
      else fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && st.getPath.getName.startsWith("pin_")).flatMap { st =>
        val in = fs.open(st.getPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        try Some(txt.toLong)
        catch { case _: NumberFormatException => None }
      }.minOption
    }
  }

  /** True when a registered pin addresses already-recorded history —
    * the condition under which maintenance compaction must not run
    * (its barrier would seal the pinned seq). A pin above every
    * recorded seq addresses nothing yet and does not block.
    */
  def pinBlocksCompaction(spark: SparkSession, stateDir: String): Boolean =
    Pins(stateDir).minSeq(spark).exists { p =>
      OpLog(stateDir).entries(spark).map(_._1).maxOption.exists(p <= _)
    }

  /** Default compaction target file size for the composed maintenance
    * policy — one comfortable parquet row-group-sized output file per
    * merged partition dir at production sizes.
    */
  val defaultTargetFileBytes: Long = 128L * 1024 * 1024

  /** What one `maintainIfDue` cycle did to a state root — the report
    * an operator's maintenance cron logs. `pinned` means a registered
    * pin addressed recorded history, so every structural action
    * (redomain, retrain, compact — all epoch barriers or wholesale
    * rewrites) was skipped this cycle; re-run after the pin releases.
    * `driftMicro` (round 13) is the drift ratio the cycle MEASURED, in
    * µ (1e6 = the training-era baseline): the evidence behind a fired
    * retrain, recorded so an operator can see WHY after the fact; −1
    * when the cycle measured none (pinned, redomained-first, or a
    * gate with no codebook).
    */
  final case class Maintenance(pinned: Boolean, redomained: Boolean,
      retrained: Boolean, compacted: Boolean,
      driftMicro: Long = -1L) {
    def any: Boolean = redomained || retrained || compacted
  }

  /** MAINTENANCE REPORT LOG (round 13): one tiny named file per
    * `maintainIfDue` cycle under `<state>/maintlog/` — the operator's
    * persisted record of what each cron cycle did and the drift it
    * measured. Plain files like the [[OpLog]], deliberately NOT a
    * parquet sub-table: compaction and migration rebuild sub-tables,
    * and the report must survive both (compaction never touches the
    * dir; [[migrate]] carries it next to the ledger). Snapshots don't
    * copy it — it is operational history, not state.
    */
  final case class MaintLog(stateDir: String) {
    private def dir = new org.apache.hadoop.fs.Path(s"$stateDir/maintlog")

    private def fsOf(spark: SparkSession) =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** (cycle, seqObserved, report) ascending by cycle. Torn or
      * unparsable files are skipped (the log degrades to fewer
      * entries, never a read failure).
      */
    def entries(spark: SparkSession): Seq[(Long, Long, Maintenance)] = {
      val fs = fsOf(spark)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && st.getPath.getName.startsWith("maint_")).flatMap { st =>
        val in = fs.open(st.getPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val kv = txt.split(" ").flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }).toMap
        // the `eot` terminator is written LAST (round 15): a record
        // that carries ANY eot key must carry it complete ("1"), so a
        // truncated tail — even one whose numeric prefix still parses,
        // the ADVICE r14 drift_micro=12-from-123 case — is rejected,
        // not misread. Records with no eot at all predate the
        // terminator (published before this change) and stay readable.
        if (kv.contains("eot") && !kv.get("eot").contains("1")) None
        else try for {
          cycle <- kv.get("cycle").map(_.toLong)
          seq <- kv.get("seq").map(_.toLong)
          p <- kv.get("pinned").map(_.toBoolean)
          rd <- kv.get("redomained").map(_.toBoolean)
          rt <- kv.get("retrained").map(_.toBoolean)
          c <- kv.get("compacted").map(_.toBoolean)
          dm <- kv.get("drift_micro").map(_.toLong)
        } yield (cycle, seq, Maintenance(p, rd, rt, c, dm))
        catch { case _: IllegalArgumentException => None }
      }.sortBy(_._1)
    }

    /** Record one cycle's report; returns the assigned cycle number.
      * `seq` snapshots the ledger high mark the cycle observed, so a
      * report row is placeable against the operation history.
      */
    def record(spark: SparkSession, report: Maintenance): Long = {
      val fs = fsOf(spark)
      fs.mkdirs(dir)
      val seq = OpLog(stateDir).entries(spark)
        .map(_._1).maxOption.getOrElse(0L)
      // claim the cycle number by PUBLISHING a fully-written tmp file
      // with a rename to the final name (ADVICE r14): the record is
      // complete on disk before it becomes visible, so a crash
      // mid-write can never leave a truncated maint_<cycle> whose
      // final field still parses as a valid-but-wrong number — and on
      // HDFS the rename atomically fails when the target exists, so
      // two overlapping maintainIfDue cycles that both compute max+1
      // collide on the claim instead of one report silently
      // overwriting the other (the loser retries with the next
      // number). Local/checksum filesystems only approximate the
      // rename-fails-if-exists contract — the explicit exists probe
      // plus the `eot` terminator [[entries]] requires keep even that
      // degraded race at worst losing ONE loser's report, never
      // surfacing a torn one.
      var cycle = entries(spark).map(_._1).maxOption.getOrElse(0L) + 1L
      val txtOf = (c: Long) =>
        s"cycle=$c seq=$seq pinned=${report.pinned} " +
          s"redomained=${report.redomained} " +
          s"retrained=${report.retrained} " +
          s"compacted=${report.compacted} " +
          s"drift_micro=${report.driftMicro} eot=1"
      var attempts = 0
      var done = false
      while (!done) {
        val f = new org.apache.hadoop.fs.Path(dir, s"maint_$cycle")
        // tmp name is unique per attempt (never matches the maint_
        // listing prefix, so a crashed attempt is invisible to reads)
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s"_tmp_maint_${cycle}_${java.util.UUID.randomUUID}")
        try {
          val out = fs.create(tmp, false)
          try out.write(txtOf(cycle).getBytes("UTF-8")) finally out.close()
          if (fs.exists(f) || !fs.rename(tmp, f)) {
            fs.delete(tmp, false)
            throw new java.io.IOException(s"cycle $cycle already claimed")
          }
          done = true
        } catch {
          case _: java.io.IOException if attempts < 64 =>
            fs.delete(tmp, false)
            attempts += 1; cycle += 1L
        }
      }
      cycle
    }
  }

  /** SNAPSHOT a state root as of an [[OpLog]] sequence number:
    * materialize a new, self-contained root holding exactly the
    * generations of operations with `seq ≤ asOfSeq`, as a pure byte
    * copy of the (immutable) generation dirs plus the matching marker
    * files, the ledger prefix, and `_LAYOUT`. No Spark job, no
    * rewrite. Compactions are epoch barriers: they merge earlier
    * generations into `ingest=-1` (and consolidate markers), so a
    * snapshot before the latest barrier fails fast. Because compaction
    * merges per sub-table and only where fragmented, the selected set
    * includes BOTH the compacted dir and every selected operation's
    * own generation — each sub-table holds exactly one of the two, and
    * copying whichever exists is correct in both cases.
    */
  /** Ledger kinds that seal earlier history: compaction merges prior
    * generations into `ingest=-1`, and migration rebuilds the whole
    * state as `ingest=-1` (round 11 — migrate now carries the ledger
    * and records itself, so pre-migration seqs fail fast here instead
    * of silently materializing empty snapshots).
    */
  private val barrierKinds = Set("compact", "migrate")

  /** The `ingest=` generation values that make up the state as of
    * ledger seq `asOfSeq`: the selected folds' batch ids, the selected
    * deletes' tombstone generations, and `-1` when a barrier
    * (compaction/migration) is part of the prefix. Fails fast when
    * nothing is recorded at or before the seq, or when a LATER barrier
    * merged the addressed history away. Shared by [[snapshot]] (which
    * byte-copies these generations) and the gates' native as-of query
    * faces (which filter reads to them in place — same addressability
    * contract, no materialized copy).
    */
  def gensAsOf(spark: SparkSession, stateDir: String,
      asOfSeq: Long): Set[Long] = {
    val es = OpLog(stateDir).entries(spark)
    val pre = es.filter(_._1 <= asOfSeq)
    require(pre.nonEmpty,
      s"nothing recorded at or before seq $asOfSeq in $stateDir/oplog")
    val laterBarrier = es.filter(e => barrierKinds(e._2)).map(_._1)
      .filter(_ > asOfSeq)
    require(laterBarrier.isEmpty,
      s"history as of seq $asOfSeq was merged away by compaction or " +
        s"migration (barrier seq ${laterBarrier.min}) — as-of reads " +
        "are only addressable at or after the latest barrier")
    val hasBarrier = pre.exists(e => barrierKinds(e._2))
    (if (hasBarrier) Set(-1L) else Set.empty[Long]) ++
      pre.collect {
        case (_, "fold", b) => b
        case (_, "del", d) => -(2L + d)
      }
  }

  def snapshot(spark: SparkSession, stateDir: String, destDir: String,
      asOfSeq: Long, subs: Seq[Sub], markerDirs: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = new org.apache.hadoop.fs.Path(stateDir)
    val fs = srcRoot.getFileSystem(conf)
    val dest = new org.apache.hadoop.fs.Path(destDir)
    require(!fs.exists(dest), s"snapshot destination exists: $destDir")
    val es = OpLog(stateDir).entries(spark)
    val pre = es.filter(_._1 <= asOfSeq)
    val gens: Set[Long] = gensAsOf(spark, stateDir, asOfSeq)
    val rootUri = fs.makeQualified(srcRoot).toUri
    def relOf(p: org.apache.hadoop.fs.Path): String =
      rootUri.relativize(fs.makeQualified(p).toUri).getPath
    def copy(rel: String): Unit = {
      val s = new org.apache.hadoop.fs.Path(srcRoot, rel)
      val d = new org.apache.hadoop.fs.Path(dest, rel)
      fs.mkdirs(d.getParent)
      require(org.apache.hadoop.fs.FileUtil.copy(fs, s, fs, d,
        false, true, conf), s"snapshot copy failed: $rel")
    }
    // generations actually found and copied, for the materialization
    // check below (ADVICE r10 medium: snapshot never verified that a
    // selected generation existed, so a damaged state silently
    // produced an empty snapshot that queries answer empty on)
    var seen = Set.empty[Long]
    for (sub <- subs) {
      val subRoot = new org.apache.hadoop.fs.Path(srcRoot, sub.name)
      if (fs.exists(subRoot)) {
        def walk(p: org.apache.hadoop.fs.Path): Unit = {
          val dirs = fs.listStatus(p).toSeq.filter(_.isDirectory)
          val (genDirs, deeper) =
            dirs.partition(_.getPath.getName.startsWith("ingest="))
          for (g <- genDirs) {
            val v = g.getPath.getName.stripPrefix("ingest=").toLong
            if (gens.contains(v)) { copy(relOf(g.getPath)); seen += v }
          }
          deeper.foreach(d => walk(d.getPath))
        }
        walk(subRoot)
      }
    }
    for (mdir <- markerDirs) {
      val p = new org.apache.hadoop.fs.Path(srcRoot, mdir)
      if (fs.exists(p))
        for (st <- fs.listStatus(p)
            if st.isFile && st.getPath.getName.startsWith("ingest=")
              && gens.contains(
                st.getPath.getName.stripPrefix("ingest=").toLong)) {
          copy(s"$mdir/${st.getPath.getName}")
          seen += st.getPath.getName.stripPrefix("ingest=").toLong
        }
    }
    // every selected operation AFTER the latest barrier must have
    // materialized in at least one sub-table or marker dir (operations
    // at or before it were legitimately merged into ingest=-1; a
    // crashed compaction that recorded its intent barrier but never
    // merged leaves the named generations in place, which this check
    // accepts — the snapshot then equals the recovered live state)
    val latestBarrier = pre.filter(e => barrierKinds(e._2))
      .map(_._1).maxOption.getOrElse(Long.MinValue)
    val mustFind: Set[Long] = pre.filter(_._1 > latestBarrier).collect {
      case (_, "fold", b) => b
      case (_, "del", d) => -(2L + d)
    }.toSet
    require(mustFind.subsetOf(seen),
      s"snapshot of $stateDir at seq $asOfSeq found no on-disk " +
        s"generation for ledger operation(s) gen=${
          (mustFind -- seen).toSeq.sorted.mkString(",")} — the state " +
        "is damaged or mid-maintenance; refusing to materialize a " +
        "silently incomplete snapshot")
    val oplogDir = new org.apache.hadoop.fs.Path(srcRoot, "oplog")
    for (st <- fs.listStatus(oplogDir)
        if st.isFile && st.getPath.getName.startsWith("op_")) {
      val name = st.getPath.getName.stripPrefix("op_").split("_", 2)
      val kept = pre.exists(e =>
        e._2 == name(0) && name.length == 2 && e._3.toString == name(1))
      if (kept) copy(s"oplog/${st.getPath.getName}")
    }
    copy(layoutMarker)
    ()
  }

  final case class Markers(stateDir: String, name: String = "ncount") {
    private def paths = (
      new org.apache.hadoop.fs.Path(s"$stateDir/$name"),
      new org.apache.hadoop.fs.Path(s"$stateDir/${name}_new"),
      new org.apache.hadoop.fs.Path(s"$stateDir/${name}_old"))

    /** Repair an interrupted consolidation swap: restore a live dir
      * lost between the renames, then clear stale staging leftovers.
      * Call on every state touch (the gates call it from ensureLayout).
      */
    def recover(spark: SparkSession): Unit = {
      val (live, neu, old) = paths
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live),
          s"$name-swap recovery: rename $old -> $live failed")
      fs.delete(neu, true)
      fs.delete(old, true)
    }

    /** Marker writes go to a temp name and rename into place: an
      * in-place truncate-create left a window where a crash mid-write
      * published a torn or empty marker, which [[stored]] would then
      * either throw on or silently mis-sum (ADVICE r9) — rename is the
      * filesystem's atomic publish.
      */
    def write(spark: SparkSession, batchId: Long, values: Seq[Long]): Unit = {
      val (live, _, _) = paths
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(live)
      val f = new org.apache.hadoop.fs.Path(live, s"ingest=$batchId")
      val tmp = new org.apache.hadoop.fs.Path(live, s"_tmp_ingest_$batchId")
      fs.delete(tmp, false)
      val out = fs.create(tmp, true)
      try out.write(values.mkString(",").getBytes("UTF-8"))
      finally out.close()
      fs.delete(f, false)
      require(fs.rename(tmp, f), s"marker publish rename $tmp -> $f failed")
    }

    /** Element-wise sum of every `ingest=*` marker (ragged markers pad
      * with 0 — tolerates a gate widening its marker arity). Empty when
      * no markers exist. `gens`, when given, restricts the sum to the
      * named generations — the as-of query faces' corpus constants
      * ([[gensAsOf]]); a marker whose generation fails to parse is
      * skipped under a filter (it cannot be attributed to a selected
      * operation).
      */
    def stored(spark: SparkSession,
        gens: Option[Set[Long]] = None): Seq[Long] = {
      val (live, _, _) = paths
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(live)) Seq.empty
      // only `ingest=*` marker files count — never staging temps or
      // filesystem droppings that may share the dir
      else fs.listStatus(live).filter { st =>
        st.isFile && st.getPath.getName.startsWith("ingest=") &&
          gens.forall { g =>
            try g.contains(st.getPath.getName.stripPrefix("ingest=").toLong)
            catch { case _: NumberFormatException => false }
          }
      }.flatMap { st =>
        val in = fs.open(st.getPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        // a marker that does not parse as comma-separated longs (torn
        // write from a pre-rename build, external damage) is SKIPPED —
        // the conservative undercount the crash contract already
        // documents — instead of throwing or mis-summing (ADVICE r9)
        try Some(txt.split(",").map(_.trim.toLong).toSeq)
        catch { case _: NumberFormatException => None }
      }.foldLeft(Seq.empty[Long]) { (a, b) =>
        a.zipAll(b, 0L, 0L).map { case (x, y) => x + y }
      }
    }

    /** Merge all markers into one `ingest=-1` file (run at compaction —
      * otherwise the sizing read's file count grows one-per-batch
      * forever; a batch re-delivered AFTER its marker was merged
      * re-writes its own file, double-counting that batch until the
      * next consolidation — a bounded overcount, same tolerance as the
      * data-side re-delivery-after-compaction case).
      */
    def consolidate(spark: SparkSession): Unit = {
      val (live, neu, old) = paths
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(live)) {
        val markers = fs.listStatus(live).filter(st =>
          st.isFile && st.getPath.getName.startsWith("ingest="))
        if (markers.length > 1) {
          val total = stored(spark)
          fs.delete(neu, true)
          fs.mkdirs(neu)
          val out = fs.create(
            new org.apache.hadoop.fs.Path(neu, "ingest=-1"), true)
          try out.write(total.mkString(",").getBytes("UTF-8"))
          finally out.close()
          require(fs.rename(live, old), s"rename $live -> $old failed")
          require(fs.rename(neu, live), s"rename $neu -> $live failed")
          fs.delete(old, true)
        }
      }
    }
  }
}
