package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends SparkSpecBase {

  test("funnel_steps: conversion counts are monotone non-increasing and non-trivial") {
    val rows = EventOps.funnelSteps(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(rows("1_view") >= rows("2_click"), "more clickers than viewers")
    assert(rows("2_click") >= rows("3_purchase"), "more buyers than clickers")
    assert(rows("1_view") > 0, "funnel is empty — test data regression")
  }

  test("rolling_stats: frame never exceeds 5 rows, peak bounds the mean, row count preserved") {
    val df = graft.operators.WindowOps.rollingStats(spark, sf).cache()
    try {
      assert(df.count() == Tables.load(spark, sf, "events").count(),
        "rolling stats must be row-preserving")
      val bad = df.filter(col("n_win") < 1 || col("n_win") > 5 ||
        col("avg_5") > col("max_5") + lit(1e-9)).count()
      assert(bad == 0, "frame size or mean/peak relation violated")
    } finally df.unpersist()
  }

  test("skew_profile: every key in exactly one bucket, shares are sane") {
    val df = graft.operators.ScaleOps.skewProfile(spark, sf).cache()
    try {
      val events = Tables.load(spark, sf, "events")
      val nKeys = events.select("user_id").distinct().count()
      val nRows = events.count()
      val agg = df.agg(sum(col("n_keys")), sum(col("bucket_rows")),
        sum(col("bucket_share_micro"))).first()
      assert(agg.getLong(0) == nKeys, "a key is missing from the histogram")
      assert(agg.getLong(1) == nRows, "row mass lost across buckets")
      // floor-quantized shares can undershoot 1e6 by at most #buckets
      assert(agg.getLong(2) <= 1000000L && agg.getLong(2) > 1000000L - 64,
        "bucket shares do not sum to ~1")
      val inverted = df.filter(col("min_rows") > col("max_rows") ||
        expr("min_rows < shiftleft(cast(1 as bigint), bucket)") ||
        expr("max_rows >= shiftleft(cast(1 as bigint), bucket + 1)")).count()
      assert(inverted == 0, "a bucket holds a count outside [2^b, 2^(b+1))")
    } finally df.unpersist()
  }

  test("event_pagerank: one rank per event type, bounded below by the teleport term, mass never exceeds the start total") {
    val df = graft.operators.EventOps.eventPagerank(spark, sf)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("view", "click", "purchase", "signup", "error"))
    assert(rows.values.forall(_ >= 30000L),
      "a rank fell below the (1-d)/N teleport floor")
    // floor-division only ever loses mass: the damped total stays under
    // the initial 5 * 200000 µ-units
    assert(rows.values.sum <= 1000000L, "rank mass was created from nothing")
    assert(rows.values.sum > 900000L,
      "floor losses should stay small on a dense 5-node graph")
  }

  test("scd2_history: one current version per user, chained non-overlapping ranges, no no-op versions") {
    val df = EventOps.scd2History(spark, sf).cache()
    try {
      val perUser = df.groupBy("user_id")
        .agg(sum(col("is_current")).as("n_current"))
      assert(perUser.filter(col("n_current") =!= 1).count() == 0,
        "a user has zero or multiple open versions")
      val badRange = df.filter(
        col("valid_to_us").isNotNull &&
          col("valid_to_us") <= col("valid_from_us")).count()
      assert(badRange == 0, "a version's validity range is empty or inverted")
      // tiebreak equal valid_from_us (two state changes in the same µs):
      // the earlier version's valid_to equals that same instant, so
      // ordering by (valid_from, valid_to NULLS LAST) reconstructs the
      // operator's (tus, event_id) order without needing event_id
      val w = Window.partitionBy("user_id")
        .orderBy(col("valid_from_us"),
          coalesce(col("valid_to_us"), lit(Long.MaxValue)))
      val seq = df.select(col("user_id"), col("state"),
        col("valid_from_us"), col("valid_to_us"))
        .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
        .withColumn("next_state", lead(col("state"), 1).over(w))
      val gaps = seq.filter(col("next_from").isNotNull &&
        (col("valid_to_us").isNull ||
          col("valid_to_us") =!= col("next_from"))).count()
      assert(gaps == 0, "validity ranges do not chain exactly")
      val noop = seq.filter(col("next_state").isNotNull &&
        col("next_state") === col("state")).count()
      assert(noop == 0, "consecutive versions with identical state survived collapse")
    } finally df.unpersist()
  }

  test("retention_cohorts: offsets non-negative; week-0 users cover the whole user base") {
    val df = operators.EventOps.retentionCohorts(spark, sf).cache()
    try {
      assert(df.filter(col("week_offset") < 0).count() == 0,
        "an event predates its user's first event")
      assert(df.filter(col("n_users") < 1 ||
        col("n_events") < col("n_users")).count() == 0)
      // every user appears in their cohort's offset-0 cell, so the
      // offset-0 user sum equals the distinct user count
      val week0 = df.filter(col("week_offset") === 0)
        .agg(sum("n_users")).head.getLong(0)
      val users = Tables.load(spark, sf, "events")
        .select("user_id").distinct().count()
      assert(week0 == users, s"offset-0 covers $week0 of $users users")
    } finally df.unpersist()
  }

  test("ab_test: variants partition the user base; rates, lift, and z cohere") {
    val r = operators.EventOps.abTest(spark, sf).collect()
    assert(r.length == 1, "expected a single summary row")
    val m = r.head.getValuesMap[Long](Seq("n_a", "n_b", "conv_a", "conv_b",
      "rate_a_micro", "rate_b_micro", "lift_micro", "z_micro"))
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(m("n_a") + m("n_b") == users, "variants do not partition users")
    assert(m("conv_a") <= m("n_a") && m("conv_b") <= m("n_b"))
    assert(m("rate_a_micro") == m("conv_a") * 1000000L / m("n_a"))
    assert(m("lift_micro") == m("rate_b_micro") - m("rate_a_micro"))
    // floor-µ lift and the exact-double z always agree in sign
    if (m("lift_micro") > 0) assert(m("z_micro") >= 0)
    if (m("lift_micro") < 0) assert(m("z_micro") <= 0)
  }

  test("trend_slope: hand-computed OLS on a constructed stream; degenerate spread is NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    try {
      // events store raw NANOSECOND longs (Tables.eventsRawSchema)
      def ts(h: Int): Long =
        (java.sql.Timestamp.valueOf(f"2024-05-01 $h%02d:00:00").getTime
          * 1000000L)
      // user 1: y = 2.00·x + 1.00 exactly at hours 0,1,2 → slope 200 c/h
      // user 2: decreasing 10.00 − 0.50·x → slope −50 c/h
      // user 3: single event → NULL; user 4: two events same hour → NULL
      Seq(
        (1L, 1L, ts(0), "view", 1.00), (2L, 1L, ts(1), "view", 3.00),
        (3L, 1L, ts(2), "view", 5.00),
        (4L, 2L, ts(0), "view", 10.00), (5L, 2L, ts(2), "view", 9.00),
        (6L, 3L, ts(5), "view", 7.00),
        (7L, 4L, ts(3), "view", 1.00), (8L, 4L, ts(3), "view", 9.00))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val rows = graft.operators.EventOps.trendSlope(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(rows(1L) == Some(200L * 1000000L), s"user 1: ${rows(1L)}")
      assert(rows(2L) == Some(-50L * 1000000L), s"user 2: ${rows(2L)}")
      assert(rows(3L).isEmpty, "single event must yield NULL slope")
      assert(rows(4L).isEmpty, "zero x-spread must yield NULL slope")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("event_transitions: rows are a valid conditional distribution per source type") {
    val df = EventOps.eventTransitions(spark, sf).cache()
    try {
      assert(df.count() > 0)
      // per prev_type, floor-µ probabilities sum into (1e6 − |row|, 1e6]
      val sums = df.groupBy("prev_type")
        .agg(sum(col("p_micro")).as("s"), count(lit(1)).as("k"))
      assert(sums.filter(col("s") > 1000000L ||
        col("s") <= lit(1000000L) - col("k")).count() == 0,
        "conditional probabilities do not sum to one within floor slack")
      // transition mass conserves: Σ n_trans = Σ (per-user n − 1)
      val total = df.agg(sum("n_trans")).head.getLong(0)
      val expected = Tables.load(spark, sf, "events")
        .groupBy("user_id").count()
        .agg(sum(col("count") - 1)).head.getLong(0)
      assert(total == expected, s"transition mass $total != $expected")
    } finally df.unpersist()
  }
}
