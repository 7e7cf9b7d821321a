package graft.streaming

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-STATIC enrichment join — the third join face beside the batch
  * enrichment joins and AttributionStream's stream-stream interval
  * join: an unbounded event stream left-joined to a bounded dimension
  * (customer → market segment), unmatched keys degraded to a sentinel
  * (the J4 discipline — an enrichment miss must not drop the fact row).
  *
  * Semantics worth knowing (and spec-pinned): the STATIC side is
  * re-resolved when a query (re)starts, so a dimension updated between
  * runs is visible to later batches without touching the checkpoint —
  * the streaming analog of the slowly-refreshed broadcast dim every
  * enrichment pipeline runs. No state, no watermark: a stream-static
  * join buffers nothing (only stream-stream joins hold state), so this
  * face costs a broadcast hash join per micro-batch at any scale.
  */
object EnrichStream {

  def start(spark: SparkSession, sourceDir: String, dimDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val dim = spark.read.parquet(dimDir)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    spark.readStream
      .schema(IncrementalPipeline.eventSchema)
      .parquet(sourceDir)
      .join(F.broadcast(dim), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
