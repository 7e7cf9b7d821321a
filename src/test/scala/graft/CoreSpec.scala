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

  test("set_compare: legs are disjoint and together cover exactly the click user-days") {
    val df = operators.Core.setCompare(spark, sf).cache()
    try {
      val legs = df.groupBy("relation").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(legs.keySet == Set("click_and_purchase", "click_only"),
        s"unexpected legs: $legs")
      assert(legs.values.forall(_ > 0), s"an empty leg: $legs")
      // a user-day appears in exactly one leg
      assert(df.select("user_id", "day").distinct().count() == df.count(),
        "a user-day landed in both legs")
      // union of legs == distinct click user-days
      val clickDays = Tables.load(spark, sf, "events")
        .filter(col("event_type") === "click")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct().count()
      assert(df.count() == clickDays, "legs do not partition the click days")
    } finally df.unpersist()
  }

  test("rollup_merge: daily→monthly merge equals the direct monthly rollup") {
    val merged = operators.Rollups.rollupMerge(spark, sf)
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy(
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("ship_month"),
        col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(14,2)")).cast("double")
        .as("sum_qty"), count(lit(1)).as("n_lines"))
    val joined = merged.join(direct, Seq("ship_month", "l_returnflag"), "full")
    assert(joined.filter(
      merged("sum_qty").isNull || direct("sum_qty").isNull ||
        merged("sum_qty") =!= direct("sum_qty") ||
        merged("n_lines") =!= direct("n_lines")).count() == 0,
      "merging daily partials diverged from the direct rollup")
  }

  test("split_leak_check: reported pairs genuinely straddle splits and verify above threshold") {
    val df = operators.TrainOps.splitLeakCheck(spark, sf).cache()
    try {
      assert(df.filter(col("split_a") === col("split_b")).count() == 0,
        "a same-split pair leaked into the report")
      assert(df.filter(col("jac_micro") < 300000L).count() == 0,
        "a sub-threshold pair survived")
      // labels agree with dataset_split's assignment
      val sp = operators.TrainOps.datasetSplit(spark, sf)
        .select(col("doc_id"), col("split"))
      val bad = df
        .join(sp.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("split", "sa"), Seq("a_id"))
        .join(sp.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("split", "sb"), Seq("b_id"))
        .filter(col("split_a") =!= col("sa") || col("split_b") =!= col("sb"))
        .count()
      assert(bad == 0, "leak-report split labels disagree with dataset_split")
    } finally df.unpersist()
  }
}
