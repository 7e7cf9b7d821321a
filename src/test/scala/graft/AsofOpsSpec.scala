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
}
