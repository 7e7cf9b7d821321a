package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.QuarantineStream

class QuarantineStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("quarantine stream: invalid rows divert with the first failing reason; clean rows pass; replay never duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dlq").toString
    val src = s"$root/src"; val ok = s"$root/ok"
    val dlq = s"$root/dlq"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def write(rows: Seq[(Long, Timestamp, java.lang.Long, String, java.lang.Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    write(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-05-01 01:05:00"), null, "click", 2.0),     // null user
      (3L, ts("2024-05-01 01:10:00"), 8L, "bogus_type", 3.0),  // bad type
      (4L, ts("2024-05-01 01:15:00"), 9L, "view", -4.0),       // negative
      // null user AND bad type: FIRST rule names the reason
      (5L, ts("2024-05-01 01:20:00"), null, "bogus_type", 5.0),
      (6L, ts("2024-05-01 01:25:00"), 10L, "purchase", 6.0)))
    QuarantineStream.start(spark, src, ok, dlq, ckp).awaitTermination()

    val clean = spark.read.parquet(ok)
    assert(clean.count() == 2, s"expected 2 clean rows, got ${clean.count()}")
    assert(clean.select("event_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 6L))
    assert(!clean.columns.contains("quarantine_reason"),
      "the clean sink must not carry the diagnostic column")

    val bad = spark.read.parquet(dlq).collect()
      .map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("quarantine_reason")).toMap
    assert(bad == Map(
      2L -> "user_id_not_null",
      3L -> "known_event_type",
      4L -> "value_non_negative",
      5L -> "user_id_not_null"), s"wrong quarantine set: $bad")

    // replay with the same checkpoint and no new files: no duplicates
    QuarantineStream.start(spark, src, ok, dlq, ckp).awaitTermination()
    assert(spark.read.parquet(ok).count() == 2)
    assert(spark.read.parquet(dlq).count() == 4)

    // a later batch appends to both sinks; a NULL event_type must NOT
    // slip through the IN-list gate (NULL NOT IN (...) is NULL in SQL)
    write(Seq(
      (7L, ts("2024-05-01 02:00:00"), 11L, "signup", 7.0),
      (8L, ts("2024-05-01 02:05:00"), 12L, "view", -1.0),
      (9L, ts("2024-05-01 02:10:00"), 13L, null, 9.0)))
    QuarantineStream.start(spark, src, ok, dlq, ckp).awaitTermination()
    assert(spark.read.parquet(ok).count() == 3)
    val dlq2 = spark.read.parquet(dlq)
    assert(dlq2.count() == 6)
    assert(dlq2.filter(col("event_id") === 9L).collect()
      .head.getAs[String]("quarantine_reason") == "known_event_type",
      "null event_type must quarantine under the type rule")

    // sinks are laid out per-batch so an uncommitted replay overwrites
    // its own directory instead of appending duplicates
    assert(spark.read.parquet(ok).columns.contains("batch_id"),
      "clean sink should be batch_id-partitioned for idempotent replay")
  }
}
