package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.EnrichStream

class EnrichStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static enrichment: dim match, sentinel degrade, replay-safe, dim refresh visible on restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-enrich").toString
    val src = s"$root/src"; val dim = s"$root/dim"
    val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    Seq((7L, "BUILDING"), (8L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment").write.parquet(dim)

    def write(rows: Seq[(Long, Timestamp, java.lang.Long, String, java.lang.Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: two known users, one unknown (must degrade, not drop)
    write(Seq(
      (1L, ts("2024-05-01 01:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-05-01 01:05:00"), 8L, "view", 2.0),
      (3L, ts("2024-05-01 01:10:00"), 99L, "click", 3.0)))
    EnrichStream.start(spark, src, dim, out, ckp).awaitTermination()

    val r1 = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
    assert(r1 == Map(1L -> "BUILDING", 2L -> "MACHINERY", 3L -> "unknown"),
      s"enrichment wrong: $r1")

    // replay with the same checkpoint and no new files: no duplicates
    EnrichStream.start(spark, src, dim, out, ckp).awaitTermination()
    assert(spark.read.parquet(out).count() == 3, "replay duplicated rows")

    // dim refresh between runs: user 99 becomes known; only NEW events
    // see the refreshed dim (already-enriched rows are immutable)
    Seq((7L, "BUILDING"), (8L, "MACHINERY"), (99L, "FURNITURE"))
      .toDF("c_custkey", "c_mktsegment").write.mode("overwrite").parquet(dim)
    write(Seq((4L, ts("2024-05-01 02:00:00"), 99L, "view", 4.0)))
    EnrichStream.start(spark, src, dim, out, ckp).awaitTermination()

    val r2 = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
    assert(r2(4L) == "FURNITURE", "restarted query did not see the refreshed dim")
    assert(r2(3L) == "unknown", "historical enrichment must be immutable")
    assert(spark.read.parquet(out).count() == 4)
  }
}
