package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.streaming.{AuditListener, IncrementalPipeline}

class AuditListenerSpec extends SparkSpecBase {

  test("audit listener records start, per-batch progress, and termination") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-audit").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckp = s"$root/ckp"
    val log = s"$root/audit.jsonl"
    Files.createDirectories(Paths.get(src))
    Seq((1L, Timestamp.valueOf("2024-05-01 01:00:00"), 7L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)

    val listener = new AuditListener(log)
    spark.streams.addListener(listener)
    try {
      IncrementalPipeline.startDedup(spark, src, out, ckp).awaitTermination()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 20000
      def lines() = if (Files.exists(Paths.get(log)))
        scala.io.Source.fromFile(log).getLines().toSeq else Seq.empty
      while (System.currentTimeMillis() < deadline &&
        (!lines().exists(_.contains("\"started\"")) ||
          !lines().exists(_.contains("\"terminated\"")))) Thread.sleep(200)
      val ls = lines()
      assert(ls.exists(_.contains("\"started\"")), s"no start event in: $ls")
      assert(ls.exists(_.contains("\"progress\"")), s"no progress event in: $ls")
      assert(ls.exists(_.contains("\"terminated\"")), s"no termination event in: $ls")
    } finally spark.streams.removeListener(listener)
  }
}
