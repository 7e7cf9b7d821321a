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
  * the batch's key spread, not the state size. Late ops lose: a state
  * row beats a batch op with an older (tus, event_id), so re-delivery
  * and out-of-order arrival cannot regress state.
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

  private def withBucket(d: DataFrame): DataFrame =
    d.withColumn("bucket", pmod(col("user_id"), lit(nBuckets)))

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
        spark.read.parquet(stateDir)
          .filter(col("bucket").isin(touched: _*))
      else
        spark.createDataFrame(spark.sparkContext
            .emptyRDD[org.apache.spark.sql.Row],
          StructType(opSchema.fields.filterNot(_.name == "op") :+
            StructField("bucket", LongType)))
    // state rows compete as upserts at their original (tus, event_id):
    // a batch op only wins its key if it is NEWER — late data loses
    val cands = state.withColumn("op", lit("upsert"))
      .unionByName(b.select(col("user_id"), col("tus"), col("event_id"),
        col("value"), col("bucket"), col("op")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").desc, col("event_id").desc)
    val winners = cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("user_id"), col("tus"), col("event_id"),
        col("value"), col("bucket"))
    // materialize BEFORE the overwrite: the merged plan reads the same
    // bucket files the dynamic overwrite is about to replace
    val next = winners.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    try {
      next.count()
      next.write
        .partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(stateDir)
      // dynamic overwrite only rewrites partitions PRESENT in the new
      // data — a touched bucket whose last key was just deleted is
      // absent from `next`, so its stale files must be removed
      // explicitly or the delete never lands
      val nonEmpty = next.select(col("bucket")).distinct()
        .collect().map(_.getLong(0)).toSet
      touched.filterNot(nonEmpty).foreach { bkt =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$stateDir/bucket=$bkt"), true)
      }
    } finally next.unpersist()
    ()
  }

  /** File-source streaming runner: watch `sourceDir` for op-log parquet
    * and fold each micro-batch into the state table. The streaming
    * checkpoint makes replay exactly-once: a restart re-processes no
    * already-committed batch, and the late-op rule makes even a manual
    * re-delivery idempotent.
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
