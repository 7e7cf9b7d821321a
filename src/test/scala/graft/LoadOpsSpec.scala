package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.operators.LoadOps
import graft.functions.Fns

class LoadOpsSpec extends SparkSpecBase {

  test("replace is idempotent: replace(replace(s,b),b) == replace(s,b)") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    val batch = LoadOps.correctedClickBatch(e)
    val once = LoadOps.applyReplace(e, batch)
    val twice = LoadOps.applyReplace(once, batch)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).count() == 0)
    assert(twice.exceptAll(once).count() == 0)
  }

  test("upsert preserves dim row count (update-else-keep, never dup)") {
    val df = LoadOps.dimUpsert(spark, sf)
    val total = Tables.load(spark, sf, "customer").count()
    assert(df.count() == total)
    assert(df.groupBy("custkey").count().filter(col("count") > 1).count() == 0)
  }

  test("data_hash is stable and 32-hex") {
    val df = LoadOps.dataHash(spark, sf)
    assert(df.filter(!col("data_hash").rlike("^[0-9a-f]{32}$")).count() == 0)
  }

  test("reformatEastern handles both sides of a DST switch, unpadded") {
    import spark.implicits._
    // US DST 2024: EST→EDT at 2024-03-10 07:00 UTC
    val df = Seq(
      "2024-03-10 06:59:00", // EST: UTC-5 → 3/10/2024 1:59
      "2024-03-10 07:01:00", // EDT: UTC-4 → 3/10/2024 3:01
      "2024-07-04 13:05:00", // EDT → 7/4/2024 9:05
      "2024-12-25 01:07:00"  // EST → 12/24/2024 20:07
    ).toDF("s").select(Fns.reformatEastern(col("s").cast("timestamp")).as("f"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq("3/10/2024 1:59", "3/10/2024 3:01",
      "7/4/2024 9:05", "12/24/2024 20:07"))
  }

  test("sentinel + label concat mirror reference semantics") {
    import spark.implicits._
    val df = Seq(("lbl", Some(3)), ("lbl", None), ("0", Some(5)))
      .toDF("label", "iter")
      .select(Fns.labelWithIteration(col("label"),
        Fns.sentinelInt(col("iter"))).as("out"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("lbl - 3", "lbl", "0"))
  }
}
