package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.loadEvents` against every events.ts on-disk encoding the
  * dataset has shipped in. The driver's testdata generation has switched
  * encodings between rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)); the
  * engine's job is to read the bytes actually on disk, so the same
  * instants written under each encoding must load to identical rows.
  *
  * The two logical-type fixtures (`events_ts_{micros,nanos}.parquet`)
  * are static resources written by a parquet writer that supports both
  * units (Spark itself cannot emit the NANOS logical type); the raw
  * INT64 epoch-nanos variant is written in-test by Spark.
  */
class EventsEncodingSpec extends SparkSpecBase {

  private def res(name: String): String =
    getClass.getResource(s"/$name").getPath

  private def loadRows(path: String): Seq[(Long, java.sql.Timestamp)] = {
    val df = Tables.loadEvents(spark, path)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must decode to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq.sortBy(_._1)
  }

  test("micros and nanos logical-type encodings load to identical instants") {
    val micros = loadRows(res("events_ts_micros.parquet"))
    val nanos  = loadRows(res("events_ts_nanos.parquet"))
    assert(micros.nonEmpty)
    assert(micros == nanos)
    // spot-pin one absolute instant (UTC session): µs precision survives
    val byId = micros.toMap
    assert(byId(3L) == java.sql.Timestamp.valueOf("2024-11-03 05:59:59.999999"))
  }

  test("raw INT64 epoch-nanos encoding loads to the same instants") {
    import spark.implicits._
    val micros = loadRows(res("events_ts_micros.parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    try {
      micros.map { case (id, t) =>
        (id, t.getTime * 1000000L + (t.getNanos % 1000000), 10L, "view", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val raw = loadRows(s"$dir/events.parquet")
      assert(raw == micros)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("absent optional columns are padded with typed nulls; surface is stable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc2").toString
    try {
      // fixture generation without props, columns in a scrambled order
      Seq((5L, 1L, java.sql.Timestamp.valueOf("2024-05-01 12:00:00").getTime * 1000000L, "view", 1.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val df = Tables.loadEvents(spark, s"$dir/events.parquet")
      assert(df.columns.toSeq == Tables.eventsSchema.fieldNames.toSeq)
      assert(df.schema("props").dataType == StringType)
      assert(df.select("props").collect().head.isNullAt(0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("the live testdata loads with 2024-range timestamps (not 1970)") {
    val df = Tables.load(spark, sf, "events")
    val yrs = df.select(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .collect().head
    assert(yrs.getInt(0) >= 2000, s"events.ts decoded into the past: ${yrs.getInt(0)}")
    assert(yrs.getInt(1) <= 2100, s"events.ts decoded into the future: ${yrs.getInt(1)}")
  }
}
