package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalPipeline

class StreamingSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("incremental pipeline: windows aggregate, checkpoint resumes, replace never duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def writeBatch(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: clicks AND a view in window [00:00, 06:00) (mixed types in
    // one window — guards the overwrite grain), plus one view in
    // [06:00, 12:00)
    writeBatch(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 10.0),
      (2L, ts("2024-05-01 02:00:00"), 7L, "click", 5.0),
      (6L, ts("2024-05-01 03:00:00"), 9L, "view", 7.0),
      (3L, ts("2024-05-01 07:00:00"), 8L, "view", 1.0)))
    val q1 = IncrementalPipeline.start(spark, src, out, ckp)
    q1.awaitTermination()

    val after1 = spark.read.parquet(out)
    val w1 = after1.filter(col("event_type") === "click")
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(w1 == 2, s"expected 2 click events after batch 1, got $w1")

    // batch 2: late-but-in-watermark CLICK lands in the SAME window →
    // the (window, click) partition is replaced (count becomes 3), and
    // the (window, view) sibling aggregate must SURVIVE the overwrite
    writeBatch(Seq(
      (4L, ts("2024-05-01 04:00:00"), 9L, "click", 2.0)))
    val q2 = IncrementalPipeline.start(spark, src, out, ckp)
    q2.awaitTermination()

    val after2 = spark.read.parquet(out)
    val clicks = after2.filter(col("event_type") === "click")
    assert(clicks.count() == 1, "one row per (window,type) — replaced, not duplicated")
    assert(clicks.agg(sum("n_events")).collect()(0).getLong(0) == 3)
    val tot = clicks.agg(sum("total_value")).collect()(0).getDouble(0)
    assert(math.abs(tot - 17.0) < 1e-9)
    // sibling event_type in the same window survived the click overwrite
    val w1views = after2.filter(col("event_type") === "view" &&
      col("window_start") === ts("2024-05-01 00:00:00"))
    assert(w1views.count() == 1,
      "view aggregate in the replaced window was deleted by the overwrite")
    assert(w1views.agg(sum("n_events")).collect()(0).getLong(0) == 1)
  }

  test("corrupt checkpoint degrades to a clean restart-from-scratch, never a wedge or duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ckpcorrupt").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def writeBatch(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    writeBatch(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 10.0),
      (2L, ts("2024-05-01 07:00:00"), 8L, "view", 1.0)))
    IncrementalPipeline.runResilient(spark, src, out, ckp)
    assert(spark.read.parquet(out).agg(sum("n_events"))
      .collect()(0).getLong(0) == 2, "first pass did not land")

    // corrupt the offset log the way checkpoint_manager.py:31-37 models
    // it (unparsable JSON on disk), then deliver more data
    val offsets = java.nio.file.Paths.get(ckp, "offsets")
    val logFiles = java.nio.file.Files.list(offsets).toArray
    assert(logFiles.nonEmpty, "no offset log to corrupt — test setup broke")
    logFiles.foreach { p =>
      java.nio.file.Files.writeString(
        p.asInstanceOf[java.nio.file.Path], "{not json")
    }
    writeBatch(Seq(
      (3L, ts("2024-05-01 08:00:00"), 9L, "click", 2.0)))

    // the degrade is SCOPED (ADVICE r5): the predicate must say
    // "unusable" for THIS corruption and "usable" for a healthy log —
    // a transient failure over a healthy checkpoint propagates with
    // checkpoint and output intact instead of destroying both
    val conf = spark.sparkContext.hadoopConfiguration
    assert(IncrementalPipeline.checkpointUnusable(conf, ckp),
      "corrupted offset log not classified unusable")
    assert(!IncrementalPipeline.checkpointUnusable(conf, s"$root/nope"),
      "a missing checkpoint is a fresh start, not a corrupt one")

    // the resilient runner must detect the unusable checkpoint, wipe it,
    // and reprocess the FULL source — same totals as a fresh run, no
    // duplicated windows from the pre-corruption output
    IncrementalPipeline.runResilient(spark, src, out, ckp)
    assert(!IncrementalPipeline.checkpointUnusable(conf, ckp),
      "the promoted rebuild checkpoint must be healthy")
    val after = spark.read.parquet(out)
    assert(after.agg(sum("n_events")).collect()(0).getLong(0) == 3,
      "restart-from-scratch must reprocess every event exactly once")
    assert(after.groupBy("window_start", "event_type").count()
      .filter(col("count") > 1).count() == 0,
      "restart produced duplicate (window, type) aggregates")
  }
}
