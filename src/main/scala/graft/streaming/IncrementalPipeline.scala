package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's incremental extract (§3.2) as Structured Streaming:
  *
  *  - T1 (6-hour tumbling window + 6-hour completeness lag) →
  *    `window($"ts", "6 hours")` + `withWatermark("ts", "6 hours")`
  *  - T2/T3 (processed-window log + checkpoint/resume) → the streaming
  *    `checkpointLocation` (exactly-once across restarts)
  *  - T6 (idempotent per-key replace) → `foreachBatch` + dynamic
  *    partition overwrite on the window-start partition column
  *
  * At scale this is the same plan a 1000-executor cluster would run:
  * the stateful window agg shuffles once on (window, event_type); state
  * store size is bounded by the watermark; the sink overwrites only the
  * partitions present in each micro-batch.
  */
object IncrementalPipeline {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** The windowed aggregation shared by batch and streaming paths. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "6 hours")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** T5 streaming face: exactly-once event delivery by key across
    * micro-batches — duplicates (re-deliveries) of an event_id are
    * dropped; dedup state is evicted once the watermark passes (bounded,
    * like the reference's status-log guard window).
    */
  def startDedup(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
      .withWatermark("ts", "1 hour")
      // key-only dedup with watermark-bounded state: a re-delivery with a
      // shifted timestamp is still the same event_id and must be dropped
      .dropDuplicatesWithinWatermark("event_id")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** File-source streaming runner: watch `sourceDir` for event parquet,
    * aggregate into 6-hour windows, and idempotently replace each
    * window's partition in `outDir` on every micro-batch (T6 semantics:
    * re-delivery of a window rewrites, never duplicates).
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
    windowedCounts(stream).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // partition on (window, event_type) — update-mode batches emit
          // only the CHANGED (window, type) aggregates, so the overwrite
          // key must be exactly that grain: keying on the window alone
          // would delete sibling event_types' rows in the same window.
          batch.withColumn("window_start_part",
              date_format(col("window_start"), "yyyyMMddHH"))
            .write
            .partitionBy("window_start_part", "event_type")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(outDir)
        }
        ()
      }
      .start()
  }

  /** Is the checkpoint's metadata log unusable (the reference's
    * "unparsable JSON on disk" failure, checkpoint_manager.py:31-37)?
    * Structured Streaming's HDFSMetadataLog contract: every offsets/ and
    * commits/ entry is a `v<N>` version header followed by one JSON
    * object (or, for some sources, a bare integer offset) per line. A
    * file that violates that format can never be resumed from; anything
    * that PARSES is a healthy checkpoint and the failure lies elsewhere
    * (bad source file, transient executor loss) — those must propagate
    * untouched, because a plain re-run resumes incrementally.
    */
  private[graft] def checkpointUnusable(
      conf: org.apache.hadoop.conf.Configuration,
      checkpointDir: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return false
    def badLog(sub: String): Boolean = {
      val d = new org.apache.hadoop.fs.Path(root, sub)
      fs.exists(d) && fs.listStatus(d).exists { st =>
        st.isFile && !st.getPath.getName.startsWith(".") && {
          val in = fs.open(st.getPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val lines = txt.split("\n", -1).toSeq
          def entryOk(l: String): Boolean =
            l.isEmpty || (l.startsWith("{") && l.endsWith("}")) ||
              l.matches("-?\\d+")
          lines.isEmpty || !lines.head.startsWith("v") ||
            lines.tail.exists(l => !entryOk(l))
        }
      }
    }
    badLog("offsets") || badLog("commits")
  }

  /** T3's degrade contract (reference checkpoint_manager.py:31-37): a
    * corrupt or unreadable checkpoint must not wedge the pipeline — the
    * reference catches the bad JSON, falls back to the default watermark
    * (-1), and reprocesses from scratch. Restart-from-scratch is SAFE
    * for exactly the reason the reference can default to -1: the sink is
    * idempotent (dynamic partition overwrite at the aggregate grain).
    *
    * Two hardening rules (ADVICE r5) beyond the naive wipe-and-rerun:
    *
    *  - the degrade is SCOPED to checkpoint-unusable failures
    *    ([[checkpointUnusable]] — the reference's unparsable-JSON case).
    *    A transient or data-induced failure propagates with checkpoint
    *    AND output intact: the checkpoint is still resumable, so
    *    destroying state would turn a retryable blip into a full (or
    *    lost) reprocess.
    *  - even a legitimate degrade never deletes the previous output
    *    before its replacement exists: the full-source rebuild lands in
    *    a STAGING directory (fresh checkpoint) and swaps in only after
    *    the rerun succeeds — the compactParquet verify-then-swap
    *    discipline. If the rerun fails too, the old output survives and
    *    the error propagates.
    */
  def runResilient(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): Unit = {
    def runOnce(out: String, ckp: String): Unit =
      start(spark, sourceDir, out, ckp).awaitTermination()
    try runOnce(outDir, checkpointDir)
    catch {
      case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        val conf = spark.sparkContext.hadoopConfiguration
        if (!checkpointUnusable(conf, checkpointDir)) throw e
        val stagingOut = outDir + "_rebuild_staging"
        val stagingCkp = checkpointDir + "_rebuild_staging"
        val so = new org.apache.hadoop.fs.Path(stagingOut)
        val sc = new org.apache.hadoop.fs.Path(stagingCkp)
        so.getFileSystem(conf).delete(so, true)
        sc.getFileSystem(conf).delete(sc, true)
        runOnce(stagingOut, stagingCkp)
        // success: swap the rebuilt output in and promote the fresh
        // checkpoint so the NEXT run resumes incrementally from here.
        // Swap order is rename-aside -> rename-in -> delete-retired
        // (compactState's discipline): a crash mid-swap leaves BOTH the
        // retired dir and the staging rebuild on disk — a read hole,
        // never data loss. A delete-then-rename would have a window
        // with no live output at all (ADVICE r6).
        val out = new org.apache.hadoop.fs.Path(outDir)
        val ofs = out.getFileSystem(conf)
        val retired = new org.apache.hadoop.fs.Path(outDir + "_pre_rebuild")
        ofs.delete(retired, true)
        if (ofs.exists(out))
          require(ofs.rename(out, retired), s"rename $out -> $retired failed")
        require(ofs.rename(so, out), s"rename $so -> $out failed")
        ofs.delete(retired, true)
        val ckp = new org.apache.hadoop.fs.Path(checkpointDir)
        ckp.getFileSystem(conf).delete(ckp, true)
        require(sc.getFileSystem(conf).rename(sc, ckp),
          s"rename $sc -> $ckp failed")
    }
  }

  /** S12 + load loop: run one AvailableNow pass over `sourceDir`, then
    * archive exactly the files that pass consumed (reference
    * bulk_loader.py:53-54,85-86 — load, then archive each file).
    *
    * The source listing is snapshotted BEFORE the query starts — the same
    * set AvailableNow will process — and archived only after successful
    * termination. Archiving inside the micro-batch sink would be wrong
    * twice over: the consumed-file list isn't visible through the
    * aggregated batch, and delete-on-incremental mid-run races any later
    * micro-batch that still needs the file.
    */
  def runWithArchive(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String, archiveRoot: String,
      processType: String = "incremental_load",
      nowMs: () => Long = System.currentTimeMillis): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(sourceDir)
    val fs = d.getFileSystem(conf)
    val snapshot =
      if (!fs.exists(d)) Seq.empty[String]
      else fs.listStatus(d).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString)
    start(spark, sourceDir, outDir, checkpointDir).awaitTermination()
    snapshot.map(f => graft.sources.FileArchive
      .archiveFile(conf, f, archiveRoot, processType, nowMs).toString)
  }
}
