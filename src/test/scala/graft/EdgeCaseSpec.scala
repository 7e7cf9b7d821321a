package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Goldens pinning the §7.4 watch-list semantics: null behavior in the
  * change-key (pandas NaN vs SQL NULL), and 6-hour window edge
  * assignment (boundary and completeness-lag off-by-ones).
  */
class EdgeCaseSpec extends SparkSpecBase {

  test("changeKey: concat_ws skips nulls — 'a'|null|'c' hashes like 'a'|'c'") {
    import spark.implicits._
    val df = Seq(("a", Option.empty[String], "c"), ("a", Some("c"), null))
      .toDF("x", "y", "z")
      .select(Fns.changeKey(col("x"), col("y"), col("z")).as("h"))
    val hs = df.collect().map(_.getString(0))
    // both rows reduce to "a|c" — the documented (and pinned) semantics
    assert(hs(0) == hs(1))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a|c".getBytes).map("%02x".format(_)).mkString
    assert(hs(0) == expected)
  }

  test("changeKey: all-null row hashes the empty string, not null") {
    import spark.implicits._
    val df = Seq((Option.empty[String], Option.empty[String]))
      .toDF("x", "y")
      .select(Fns.changeKey(col("x"), col("y")).as("h"))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes).map("%02x".format(_)).mkString
    assert(df.collect()(0).getString(0) == expected)
  }

  test("6h window assignment: exact boundary belongs to the NEXT window") {
    import spark.implicits._
    val rows = Seq(
      Timestamp.valueOf("2024-05-01 05:59:59"), // [00:00, 06:00)
      Timestamp.valueOf("2024-05-01 06:00:00"), // [06:00, 12:00) — boundary
      Timestamp.valueOf("2024-05-01 11:59:59")  // [06:00, 12:00)
    ).toDF("ts")
    val got = rows.select(window(col("ts"), "6 hours").as("w"))
      .select(col("w.start").cast("string").as("s")).collect().map(_.getString(0))
    assert(got(0) == "2024-05-01 00:00:00")
    assert(got(1) == "2024-05-01 06:00:00", "boundary event must open the next window")
    assert(got(2) == "2024-05-01 06:00:00")
  }

  test("completeness lag: window ending exactly 6h before max_ts IS included") {
    import spark.implicits._
    // max_ts = 18:00; window [06:00,12:00) ends at 12:00 == max_ts - 6h → included;
    // window [12:00,18:00) ends at 18:00 > max_ts - 6h → excluded
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-05-01 07:00:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-05-01 13:00:00"), 1L, "click", 1.0),
      (3L, Timestamp.valueOf("2024-05-01 18:00:00"), 1L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = rows.agg(max(col("ts")).as("max_ts"))
    val included = rows.crossJoin(broadcast(maxTs))
      .withColumn("w", window(col("ts"), "6 hours"))
      .filter(col("w.end") <= col("max_ts") - expr("INTERVAL 6 HOURS"))
      .select(col("w.start").cast("string")).collect().map(_.getString(0))
    assert(included.toSeq == Seq("2024-05-01 06:00:00"))
  }
}
