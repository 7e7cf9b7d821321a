package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming validity gate with a dead-letter queue: every micro-batch
  * splits into rows that pass the declarative rule set (forwarded to
  * the clean sink) and rows that fail (routed to a quarantine sink WITH
  * the first failing rule as a reason) — the standard
  * ingest-time DLQ pattern, and the streaming face of the batch
  * `operators.QualityOps.expectationsReport` gate: the batch face
  * reports rule violations, this face enforces them row-by-row without
  * stopping the pipeline.
  *
  * Scale: the split is two filters over one persisted micro-batch —
  * stateless, no shuffle. Delivery is exactly-once in effect: each
  * micro-batch lands in a batchId-deterministic partition directory
  * (`batch_id=N`) written with overwrite, so a crash between the sink
  * writes and the checkpoint commit replays the batch into the SAME
  * directories instead of appending duplicates (foreachBatch guarantees
  * a replayed epoch re-presents the same batchId). Quarantined rows
  * keep their full payload so a fixed rule or replay tool can re-ingest
  * them.
  */
object QuarantineStream {

  /** (rule name, failure predicate) — ordered; the FIRST failing rule
    * names the quarantine reason. NULL is a violation for every rule:
    * the type gate checks isNull explicitly because `NULL NOT IN (...)`
    * evaluates to NULL and would otherwise slip through the gate.
    */
  private val rules: Seq[(String, Column)] = Seq(
    "user_id_not_null" -> col("user_id").isNull,
    "known_event_type" -> (col("event_type").isNull ||
      !col("event_type").isin("view", "click", "purchase", "signup", "error")),
    "value_non_negative" -> (col("value").isNull || col("value") < 0))

  private val failReason: Column =
    rules.foldRight(lit(null).cast("string")) { case ((name, bad), acc) =>
      when(bad, name).otherwise(acc)
    }

  def start(spark: SparkSession, sourceDir: String, okDir: String,
      dlqDir: String, checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(IncrementalPipeline.eventSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val marked = batch.withColumn("quarantine_reason", failReason)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            marked.count()
            // overwrite into a per-batch partition dir: replaying an
            // uncommitted epoch rewrites, never duplicates
            marked.filter(col("quarantine_reason").isNull)
              .drop("quarantine_reason")
              .write.mode("overwrite")
              .parquet(s"$okDir/batch_id=$batchId")
            val bad = marked.filter(col("quarantine_reason").isNotNull)
            if (!bad.isEmpty)
              bad.write.mode("overwrite")
                .parquet(s"$dlqDir/batch_id=$batchId")
          } finally marked.unpersist()
        }
        ()
      }
      .start()
  }
}
