package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.SessionizeStream

/** Soak: many micro-batches with steadily advancing event time must keep
  * the stateful sessionizer's state BOUNDED (one open session per active
  * user, closed sessions evicted by the event-time timeout) — the
  * property that makes the operator safe on an unbounded 100 TB stream.
  * A state leak (e.g. timeouts never firing) grows state linearly with
  * batch count and fails the bound below.
  */
class StreamingSoakSpec extends SparkSpecBase {

  test("sessionize state stays bounded across 10 batches of advancing time") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-soak").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(Paths.get(src))
    val users = 5L

    var lastStateRows = -1L
    (0 until 10).foreach { batch =>
      // each batch: every user gets one event 24h after its previous one
      // (> the 12h gap → every batch closes the prior session and opens
      // a fresh one; timeouts fire as the watermark sweeps forward)
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = (0L until users).map { u =>
        (batch * users + u,
          new Timestamp(t0 + batch * 24L * 3600 * 1000 + u * 60000),
          u, "click", 1.0)
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)
      val q = SessionizeStream.start(spark, src, out, ckp)
      q.awaitTermination()
      val progress = q.lastProgress
      if (progress != null && progress.stateOperators.nonEmpty) {
        lastStateRows = progress.stateOperators(0).numRowsTotal
        // bound: at most one open session per user (+0 closed retained)
        assert(lastStateRows <= users,
          s"state grew past one-session-per-user after batch $batch: $lastStateRows")
      }
    }
    assert(lastStateRows >= 0, "no state metrics observed")
    // and the output actually accumulated closed sessions batch over batch
    val sessions = spark.read.parquet(out)
    assert(sessions.count() >= users * 8,
      s"expected ≥ ${users * 8} closed sessions, got ${sessions.count()}")
    assert(sessions.groupBy(col("user_id")).count()
      .filter(col("count") < 8).count() == 0,
      "every user should have closed ≥ 8 sessions")
  }
}
