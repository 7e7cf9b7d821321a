package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.Ev

class SessionizeStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming sessions close on gap and on watermark timeout; match batch semantics") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sess").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: user 7 has two events 30 min apart (one session);
    // user 8 one event
    write(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-05-01 01:30:00"), 7L, "click", 2.0),
      (3L, ts("2024-05-01 02:00:00"), 8L, "view", 3.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()

    // batch 2: user 7 again 19h later (gap > 12h → closes session 1);
    // a far-future user-9 event pushes the watermark past every
    // timeout deadline so remaining sessions close too
    write(Seq(
      (4L, ts("2024-05-01 20:00:00"), 7L, "click", 4.0),
      (5L, ts("2024-05-04 00:00:00"), 9L, "view", 5.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    // batch 3: empty-ish tick to let timed-out state flush
    write(Seq((6L, ts("2024-05-06 00:00:00"), 9L, "view", 6.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()

    val got = spark.read.parquet(out)
      .select("user_id", "session_start", "n_events", "total_value")
    // user 7 session 1: 2 events, value 3.0
    val s1 = got.filter(col("user_id") === 7 &&
      col("session_start") === ts("2024-05-01 01:00:00")).collect()
    assert(s1.length == 1 && s1(0).getLong(2) == 2 && s1(0).getDouble(3) == 3.0)
    // user 7 session 2 closed by timeout after batch 2/3
    val s2 = got.filter(col("user_id") === 7 &&
      col("session_start") === ts("2024-05-01 20:00:00")).collect()
    assert(s2.length == 1 && s2(0).getLong(2) == 1)
    // user 8's lone session closed by timeout
    assert(got.filter(col("user_id") === 8).count() == 1)

    // batch reference on the same input agrees for all CLOSED sessions
    val evs = spark.read.parquet(src)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val batch = SessionizeStream.sessionsBatch(spark, evs).toDF()
      .select("user_id", "session_start", "n_events", "total_value")
    val missing = got.exceptAll(batch).count()
    assert(missing == 0, s"$missing streamed sessions not present in batch result")
  }

  test("cross-batch late event (within watermark) extends the open session backwards") {
    val root = Files.createTempDirectory("graft-sess-late").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    import spark.implicits._
    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: open session for user 7 at 10:00 → watermark becomes 09:00
    write(Seq((1L, ts("2024-05-01 10:00:00"), 7L, "click", 1.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    // batch 2: 09:30 event is LATE relative to the open session's start but
    // above the watermark — must merge and move session_start back to 09:30
    write(Seq((2L, ts("2024-05-01 09:30:00"), 7L, "click", 2.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    // far-future events push the watermark past the timeout deadline, then
    // one more tick lets the timed-out state flush
    write(Seq((3L, ts("2024-05-10 00:00:00"), 9L, "view", 3.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    write(Seq((4L, ts("2024-05-12 00:00:00"), 9L, "view", 4.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()

    val got = spark.read.parquet(out).filter(col("user_id") === 7)
      .select("session_start", "session_end", "n_events", "total_value").collect()
    assert(got.length == 1, s"expected one closed session, got ${got.length}")
    assert(got(0).getTimestamp(0) == ts("2024-05-01 09:30:00"),
      s"late event did not extend session backwards: start=${got(0).getTimestamp(0)}")
    assert(got(0).getTimestamp(1) == ts("2024-05-01 10:00:00"))
    assert(got(0).getLong(2) == 2 && got(0).getDouble(3) == 3.0)
  }

  test("an event below the watermark is dropped, never a query killer") {
    // Pinned semantics (found empirically): FlatMapGroupsWithStateExec
    // filters input rows older than the watermark BEFORE update() runs,
    // so a 9-days-late event neither opens a session nor reaches
    // setTimeoutTimestamp with a behind-the-watermark deadline. The
    // clamp in SessionizeStream.update stays as defense-in-depth for
    // runners without this filter, and this test pins the contract: the
    // query survives, the late row is dropped, no phantom session.
    val root = Files.createTempDirectory("graft-sess-vlate").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    import spark.implicits._
    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: far-future user-9 event drives the watermark to ~05-09 23:00
    write(Seq((1L, ts("2024-05-10 00:00:00"), 9L, "view", 1.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    // batch 2: user-7 event from 05-01 — NINE DAYS below the watermark
    write(Seq((2L, ts("2024-05-01 00:00:00"), 7L, "click", 2.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    // batches 3+4: watermark ticks flush every surviving session
    write(Seq((3L, ts("2024-05-12 00:00:00"), 9L, "view", 3.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()
    write(Seq((4L, ts("2024-05-14 00:00:00"), 9L, "view", 4.0)))
    SessionizeStream.start(spark, src, out, ckp).awaitTermination()

    val out7 = spark.read.parquet(out).filter(col("user_id") === 7).count()
    assert(out7 == 0, s"late event should be dropped, got $out7 phantom session(s)")
    // the query survived all four batches and user 9's sessions closed
    assert(spark.read.parquet(out).filter(col("user_id") === 9).count() >= 1)
  }
}
