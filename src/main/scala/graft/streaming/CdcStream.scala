package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CDC replay as a stream: the streaming face of
  * `operators.LoadOps.cdcApply` — an op log (upserts + delete
  * tombstones) arrives in micro-batches and folds into a per-key state
  * table via `foreachBatch`, exactly the MERGE-less pattern a real CDC
  * sink runs.
  *
  * State layout is the scale story: the state table is partitioned by a
  * key bucket (`pmod(user_id, nBuckets)`), each micro-batch reads ONLY
  * the buckets its keys touch (directory-pruned scan), merges, and
  * dynamically overwrites ONLY those bucket partitions — untouched
  * buckets are never read or rewritten, so per-batch work scales with
  * the batch's key spread, not the state size.
  *
  * Ordering: the state table RETAINS delete tombstones (the `op`
  * column), so every applied op — upsert or delete — keeps competing at
  * its original (tus, event_id) against anything that arrives later.
  * That makes cross-batch out-of-order arrival safe in both directions:
  * a late upsert older than an applied delete loses to the tombstone
  * (the key stays deleted) just as a late upsert older than an applied
  * upsert loses to the state row. Serving reads go through `readState`,
  * which filters tombstones out; `gcTombstones` reclaims tombstones once
  * no older op can still arrive (the caller's lateness horizon).
  */
object CdcStream {

  import org.apache.spark.sql.types._

  val opSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("tus", LongType),
    StructField("event_id", LongType),
    StructField("op", StringType),
    StructField("value", DoubleType)))

  private val nBuckets = 16

  /** State-table schema = op log + the bucket partition column. Reads go
    * through this EXPLICIT schema, never inference: a fully-GC'd state
    * table is an empty directory with no data files to infer from, and
    * it must read as zero rows, not fail.
    */
  val stateSchema: StructType =
    StructType(opSchema.fields :+ StructField("bucket", LongType))

  private def withBucket(d: DataFrame): DataFrame =
    d.withColumn("bucket", pmod(col("user_id"), lit(nBuckets)))

  /** Serving view of the state table: live rows only, tombstones
    * filtered out. This is what a consumer joins against.
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.schema(stateSchema).parquet(stateDir)
      .filter(col("op") =!= "delete")
      .select(col("user_id"), col("tus"), col("event_id"),
        col("value"), col("bucket"))

  /** Merge one op micro-batch into the state table at `stateDir`.
    * Exposed for the spec; `start` wires it into foreachBatch.
    */
  def applyBatch(spark: SparkSession, stateDir: String,
      batch: DataFrame): Unit = {
    if (batch.isEmpty) return
    val b = withBucket(batch)
    // bucket domain is bounded (nBuckets), so collecting the touched
    // set is a fixed-size driver list, not a data-sized collect
    val touched = b.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state: DataFrame =
      if (fs.exists(statePath))
        spark.read.schema(stateSchema).parquet(stateDir)
          .filter(col("bucket").isin(touched: _*))
      else
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], stateSchema)
    // every state row — tombstones included — competes at its original
    // (tus, event_id): a batch op only wins its key if it is NEWER, so
    // late data loses even to an already-applied delete
    val cols = Seq(col("user_id"), col("tus"), col("event_id"),
      col("op"), col("value"), col("bucket"))
    val cands = state.select(cols: _*).unionByName(b.select(cols: _*))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").desc, col("event_id").desc)
    val winners = cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(cols: _*)
    // materialize BEFORE the overwrite: the merged plan reads the same
    // bucket files the dynamic overwrite is about to replace
    val next = winners.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    try {
      next.count()
      // each batch key yields exactly one winner row (live or
      // tombstone), so every touched bucket is present in `next` and
      // the dynamic overwrite fully replaces the touched partitions
      next.write
        .partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(stateDir)
    } finally next.unpersist()
    ()
  }

  /** Reclaim tombstones older than `horizonUs` (an absolute µs-epoch
    * cutoff the caller derives from its lateness bound): once no op
    * older than the cutoff can still arrive, a tombstone below it can
    * never beat anything and is dead weight. Rewrites every bucket —
    * this is a maintenance pass, not a per-batch step.
    */
  def gcTombstones(spark: SparkSession, stateDir: String,
      horizonUs: Long): Unit = {
    // verify-then-swap (compactParquet's protocol), NOT overwrite-in-
    // place: an in-place overwrite's plan lineage reads the very files
    // it deletes, so a lost executor or evicted cached block mid-write
    // would recompute from already-deleted inputs and corrupt the state.
    // Staging is written from the live files, count-verified, and only
    // then swapped in; a crash before the swap leaves the original
    // intact.
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(stateDir + "_gc_staging")
    fs.delete(staging, true)
    val kept = spark.read.schema(stateSchema).parquet(stateDir)
      .filter(col("op") =!= "delete" || col("tus") >= horizonUs)
    val expected = kept.count()
    if (expected == 0) {
      // everything reclaimed: swap in an EMPTY directory. A partitioned
      // write of zero rows emits no data files anyway; readers survive
      // because every state read uses the explicit stateSchema instead
      // of schema inference.
      fs.mkdirs(staging)
    } else {
      kept.write.partitionBy("bucket").parquet(staging.toString)
      val got = spark.read.schema(stateSchema)
        .parquet(staging.toString).count()
      require(got == expected,
        s"tombstone GC staging lost rows ($got != $expected); " +
          "original state untouched")
    }
    fs.delete(statePath, true)
    require(fs.rename(staging, statePath),
      s"rename $staging -> $statePath failed")
    ()
  }

  /** File-source streaming runner: watch `sourceDir` for op-log parquet
    * and fold each micro-batch into the state table. The streaming
    * checkpoint makes replay exactly-once: a restart re-processes no
    * already-committed batch, and the newest-op-wins rule (over a state
    * that retains tombstones) makes even a manual re-delivery
    * idempotent.
    */
  def start(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(opSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, stateDir, batch)
      }
      .start()
  }
}
