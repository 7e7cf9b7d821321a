package graft

import org.apache.spark.sql.functions._
import graft.operators.Core

class CoreSpec extends SparkSpecBase {

  test("events_filtered applies all four predicates") {
    val df = Core.eventsFiltered(spark, sf)
    assert(df.filter(!col("event_type").isin("click", "view")).count() == 0)
    assert(df.filter(col("value") <= 10.0).count() == 0)
  }

  test("hierarchy_join degrades unmatched levels to empty string, keeps all customers") {
    val df = Core.hierarchyJoin(spark, sf)
    val total = Tables.load(spark, sf, "customer").count()
    assert(df.count() == total)
    // customers with nationkey >= 20 must degrade to ''
    assert(df.filter(col("nation_name") === "").count() > 0)
    assert(df.filter(col("nation_name").isNull).count() == 0)
  }

  test("scalar_stamp stamps the same scalar on every row") {
    val df = Core.scalarStamp(spark, sf)
    assert(df.select("stamp_region").distinct().count() == 1)
    assert(df.count() == Tables.load(spark, sf, "nation").count())
  }

  test("latest_event_per_user yields exactly one row per user") {
    val df = Core.latestEventPerUser(spark, sf)
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(df.count() == users)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("anti_join_guard excludes all (user, day) pairs with a purchase") {
    val df = Core.antiJoinGuard(spark, sf)
    val e = Tables.load(spark, sf, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
    assert(df.join(purchases, Seq("user_id", "day"), "inner").count() == 0)
  }

  test("union_append keeps duplicates (union-all semantics)") {
    val df = Core.unionAppend(spark, sf)
    val e = Tables.load(spark, sf, "events")
    val high = e.filter(col("value") > 30.0).count()
    val errs = e.filter(col("event_type") === "error").count()
    assert(df.count() == high + errs)
  }
}
