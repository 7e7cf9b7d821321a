package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.SlidingWindowStream

/** Streaming sliding windows must agree with the batch face and emit
  * each closed window exactly once, including across a restart from
  * checkpoint.
  */
class SlidingStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sliding windows: emitted set matches batch semantics, exactly once, across restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-slide").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(Paths.get(src))

    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // events spanning several 3h slides; each lands in two windows
    write(Seq(
      (1L, ts("2024-05-01 01:00:00"), 1L, "click", 2.0),
      (2L, ts("2024-05-01 04:30:00"), 1L, "view", 1.0),
      (3L, ts("2024-05-01 05:59:00"), 2L, "click", 4.0)))
    SlidingWindowStream.start(spark, src, out, ckp).awaitTermination()

    // later batch plus a far-future tick to push the watermark past the
    // early windows; a third run gives the advanced watermark a batch to
    // act in (watermark from batch N takes effect in batch N+1)
    write(Seq(
      (4L, ts("2024-05-01 07:10:00"), 2L, "view", 8.0),
      (5L, ts("2024-05-03 00:00:00"), 3L, "click", 0.0)))
    SlidingWindowStream.start(spark, src, out, ckp).awaitTermination()
    write(Seq((6L, ts("2024-05-05 00:00:00"), 3L, "click", 0.0)))
    SlidingWindowStream.start(spark, src, out, ckp).awaitTermination()

    val got = spark.read.parquet(out)
    // exactly-once: no window/type emitted twice despite three restarts
    assert(got.groupBy("w_start", "event_type").count()
      .filter(col("count") > 1).count() == 0,
      "a window was emitted more than once")

    // batch twin over the same files, through the SHARED aggregation —
    // the agreement pin compares streaming machinery, not a copy
    val all = spark.read.parquet(src)
    val batch = graft.operators.WindowOps.slidingCounts(all)
      .select(col("w.start").as("w_start"),
        col("w.end").as("w_end"),
        col("event_type"), col("n_events"), col("total_value"))
    val cols = batch.columns.map(col).toSeq

    // everything emitted must be a batch-correct window...
    assert(got.select(cols: _*).exceptAll(batch.select(cols: _*)).count() == 0,
      "stream emitted a window the batch face does not produce")
    // ...and every window strictly closed by the final watermark
    // (max_ts - 6h delay) must have been emitted
    val wm = all.agg(max(col("ts"))).first().getTimestamp(0).getTime -
      6L * 3600 * 1000
    val mustEmit = batch.filter(col("w_end").cast("long") * 1000 < wm)
    assert(mustEmit.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0,
      "a closed window was never emitted")
    assert(got.count() > 0)
  }
}
