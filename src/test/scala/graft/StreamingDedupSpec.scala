package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalPipeline

class StreamingDedupSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup drops re-delivered event ids across micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dedup").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    write(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-05-01 01:05:00"), 7L, "click", 2.0),
      (3L, ts("2024-05-01 01:10:00"), 8L, "view", 3.0)))
    IncrementalPipeline.startDedup(spark, src, out, ckp).awaitTermination()

    // batch 2 re-delivers ids 2 and 3 (same payload) plus a new id 4
    write(Seq(
      (2L, ts("2024-05-01 01:05:00"), 7L, "click", 2.0),
      (3L, ts("2024-05-01 01:10:00"), 8L, "view", 3.0),
      (4L, ts("2024-05-01 01:20:00"), 9L, "signup", 4.0)))
    IncrementalPipeline.startDedup(spark, src, out, ckp).awaitTermination()

    val got = spark.read.parquet(out)
    assert(got.count() == 4, s"expected 4 unique events, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == 4)
  }
}
