package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming face of operators.WindowOps.slidingWindow: 6-hour windows
  * sliding every 3 hours over the event stream, emitted append-mode as
  * the watermark closes them. Each event feeds exactly two overlapping
  * windows, so the state store holds ≤ (6h/3h) open windows per
  * (window, type) group beyond the watermark horizon — bounded on an
  * unbounded stream. SlidingStreamSpec asserts the emitted windows
  * agree with the batch face on shared input and are emitted exactly
  * once across restarts.
  */
object SlidingWindowStream {

  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val src = spark.readStream
      .schema(IncrementalPipeline.eventSchema)
      .parquet(sourceDir)
      .withWatermark("ts", "6 hours")
    // the aggregation is the batch face's, verbatim — one definition
    val agg = graft.operators.WindowOps.slidingCounts(src)
      .select(col("w.start").as("w_start"),
        col("w.end").as("w_end"),
        col("event_type"), col("n_events"), col("total_value"))
    agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
