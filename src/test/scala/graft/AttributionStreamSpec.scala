package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.AttributionStream

/** Stream-stream interval join: matches the batch join semantics across
  * micro-batches, including a cross-batch pair (click in batch 1,
  * purchase in batch 2) that only a correctly-buffered join can emit.
  */
class AttributionStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("click→purchase pairs match batch semantics across micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-attr").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(Paths.get(src))

    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: u7 clicks twice; one purchase 30 min after the first click
    write(Seq(
      (1L, ts("2024-05-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-05-01 10:20:00"), 7L, "click", 1.0),
      (3L, ts("2024-05-01 10:30:00"), 7L, "purchase", 9.0),
      (4L, ts("2024-05-01 10:40:00"), 8L, "click", 1.0)))
    AttributionStream.start(spark, src, out, ckp).awaitTermination()

    // batch 2: u8's purchase arrives in a LATER batch but within the hour
    // (cross-batch buffering), u7 purchase outside the window (no match),
    // plus a far-future event to close watermarks
    write(Seq(
      (5L, ts("2024-05-01 11:10:00"), 8L, "purchase", 5.0),
      (6L, ts("2024-05-01 13:00:00"), 7L, "purchase", 2.0),
      (7L, ts("2024-05-03 00:00:00"), 9L, "click", 0.0)))
    AttributionStream.start(spark, src, out, ckp).awaitTermination()
    write(Seq((8L, ts("2024-05-05 00:00:00"), 9L, "click", 0.0)))
    AttributionStream.start(spark, src, out, ckp).awaitTermination()

    val got = spark.read.parquet(out)
      .select("user_id", "click_id", "purchase_id")
    // batch twin on the full input: same join, no streaming machinery
    val all = spark.read.parquet(src)
    val c = all.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = all.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val expected = c.join(p, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "click_id", "purchase_id")

    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "streamed pairs diverge from the batch interval join")
    // the cross-batch pair specifically must be present
    assert(got.filter(col("click_id") === 4L && col("purchase_id") === 5L)
      .count() == 1, "cross-batch click→purchase pair missing")
    // and the out-of-window purchase must NOT be attributed
    assert(got.filter(col("purchase_id") === 6L).count() == 0)
  }
}
