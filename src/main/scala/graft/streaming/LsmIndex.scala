package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
private[streaming] object LsmIndex {

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

  private val layoutMarker = "_LAYOUT"

  def ensureLayout(spark: SparkSession, stateDir: String,
      version: String, subNames: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(conf)
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
    */
  def compact(spark: SparkSession, stateDir: String, subs: Seq[Sub],
      targetFileBytes: Long, minFiles: Int): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val conf = spark.sparkContext.hadoopConfiguration
    var parts = 0; var before = 0; var after = 0
    for (sub <- subs) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/${sub.name}")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        // hash-partition dirs = parents of ingest=* generation dirs
        def partDirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
          val dirs = fs.listStatus(p).toSeq.filter(_.isDirectory)
          if (dirs.exists(_.getPath.getName.startsWith("ingest="))) Seq(p)
          else dirs.flatMap(d => partDirs(d.getPath))
        }
        def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
          val st = fs.listStatus(p).toSeq
          st.filter(s => s.isFile && s.getPath.getName.startsWith("part-")) ++
            st.filter(_.isDirectory).flatMap(d => dataFiles(d.getPath))
        }
        val fragmented = partDirs(root)
          .map(pd => dataFiles(pd).size).count(_ >= minFiles)
        if (fragmented > 0) {
          val files = dataFiles(root)
          val dataCols = sub.schema.fieldNames.toSeq
            .filterNot(sub.hashCols.contains).filterNot(_ == "ingest")
          val src = spark.read.schema(sub.schema).parquet(root.toString)
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
          parts += fragmented; before += files.size
          after += dataFiles(root).size
        }
      }
    }
    (parts, before, after)
  }
}
