package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofOps

class AsofOpsSpec extends SparkSpecBase {

  test("asof_join: matched order date never exceeds the event date; row count preserved") {
    val df = AsofOps.asofJoin(spark, sf)
    val events = Tables.load(spark, sf, "events").count()
    assert(df.count() == events, "as-of join must not drop or duplicate events")
    val violations = df
      .filter(col("order_date") =!= "none" &&
        col("order_date") > substring(col("ts_str"), 1, 10)).count()
    assert(violations == 0, "a matched order postdates its event")
  }

  test("asof_join: users without orders get the -1 sentinel consistently") {
    val df = AsofOps.asofJoin(spark, sf)
    val mismatched = df.filter(
      (col("order_key") === -1L && col("order_date") =!= "none") ||
        (col("order_key") =!= -1L && col("order_date") === "none")).count()
    assert(mismatched == 0)
  }

  test("event_pivot: row per user, counts sum to user's event total") {
    val df = AsofOps.eventPivot(spark, sf)
    val perUser = Tables.load(spark, sf, "events")
      .groupBy("user_id").count()
    assert(df.count() == perUser.count())
    val joined = df.join(perUser, "user_id")
      .filter(col("click") + col("view") + col("purchase") +
        col("signup") + col("error") =!= col("count"))
    assert(joined.count() == 0)
  }

  test("value_median: one row per event_type, median within min/max") {
    val df = AsofOps.valueMedian(spark, sf)
    val bounds = Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = df.join(bounds, "event_type")
      .filter(col("median_value") < col("lo") || col("median_value") > col("hi"))
    assert(bad.count() == 0)
    assert(df.groupBy("event_type").count().filter(col("count") > 1).count() == 0)
  }

  test("resample_fill: contiguous gap-free grid per user, no null fills, first slot observed") {
    val df = AsofOps.resampleFill(spark, sf).cache()
    try {
      // per user, the grid is exactly [min, max] with no gaps or dups
      val spans = df.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        (max("slot") - min("slot") + 1).as("expect"),
        countDistinct("slot").as("nd"))
      assert(spans.filter(col("n") =!= col("expect") ||
        col("nd") =!= col("n")).count() == 0, "grid has gaps or duplicates")
      // forward fill is total: no slot lacks a value
      assert(df.filter(col("value_s").isNull).count() == 0)
      // a user's first slot is anchored at an observation
      val firsts = df.groupBy("user_id").agg(min("slot").as("slot"))
      assert(firsts.join(df, Seq("user_id", "slot"))
        .filter(col("is_observed") =!= 1).count() == 0,
        "a user's grid starts on an unobserved slot")
      // observed slots match the raw event slot set
      val rawSlots = Tables.load(spark, sf, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 21600000000").as("slot"))
        .distinct().count()
      assert(df.filter(col("is_observed") === 1).count() == rawSlots)
    } finally df.unpersist()
  }
}
