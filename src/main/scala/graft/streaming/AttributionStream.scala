package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-stream event-time interval join: purchases attributed to any
  * click by the same user within the preceding hour — the streaming face
  * of operators.WindowOps.clickAttribution (AttributionStreamSpec asserts
  * agreement on shared input).
  *
  * Both sides carry watermarks and the join condition bounds
  * purchase_ts to [click_ts, click_ts + 1h], so Spark derives state
  * watermarks for BOTH buffers: a buffered click is dropped once the
  * purchase watermark passes click_ts + 1h, a buffered purchase once the
  * click watermark passes purchase_ts — state is bounded on an unbounded
  * stream, the property that makes this safe at production scale.
  */
object AttributionStream {

  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val src = spark.readStream
      .schema(IncrementalPipeline.eventSchema)
      .parquet(sourceDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      expr("""c_user = p_user
             |AND purchase_ts >= click_ts
             |AND purchase_ts <= click_ts + INTERVAL 1 HOUR""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"))
    joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
