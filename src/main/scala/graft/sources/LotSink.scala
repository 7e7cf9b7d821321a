package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-sink layer (SURVEY.md §2.1 S5/S6 + §2.8 T6):
  *
  *  - S5: per-lot partitioned CSV sink — the reference writes one CSV per
  *    lot (bulk_fetch.py:90-91); here the lot is a partition column, so a
  *    1000-executor writer produces the same one-directory-per-lot layout
  *    with no driver involvement.
  *  - S6: append-mode audit/status sink (status_tracker.py:45-55).
  *  - T6: idempotent per-lot replace via dynamic partition overwrite —
  *    re-delivering a lot's data rewrites exactly that lot's partition
  *    (file_processor.py:95-98 DELETE-then-reinsert).
  */
object LotSink {

  /** S5: one directory per lot, CSV with headers. */
  def writeLotCsv(df: DataFrame, dir: String): Unit =
    df.write
      .partitionBy("lot_number")
      .option("header", "true")
      .mode("overwrite")
      .csv(dir)

  /** S6: append-only audit trail (parquet for schema stability). */
  def appendAudit(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** T6: replace ONLY the lot partitions present in `batch`, leaving all
    * other lots untouched.
    */
  def replaceLots(batch: DataFrame, dir: String): Unit =
    batch.write
      .partitionBy("lot_number")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
}
