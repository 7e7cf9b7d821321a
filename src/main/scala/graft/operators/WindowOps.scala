package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** T1/T2 batch face: the reference's 6-hour tumbling-window generator with
  * completeness lag (incremental_fetch.py:129-155) as an event-time
  * window aggregation. Windows are epoch-aligned (Spark `window()` and
  * DuckDB `time_bucket` agree for hour-multiple buckets); the lag rule
  * "window must end ≥ 6h before now" anchors `now` at max(ts) for
  * determinism on frozen data. The streaming face (watermark +
  * checkpoint) lives in graft.streaming.IncrementalPipeline.
  */
object WindowOps {

  def windowAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val maxTs = e.agg(max(col("ts")).as("max_ts"))
    val out = e.crossJoin(broadcast(maxTs))
      .withColumn("w", window(col("ts"), "6 hours"))
      .filter(col("w.end") <= col("max_ts") - expr("INTERVAL 6 HOURS"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .select(
        Fns.tsStr(col("w.start")).as("window_start"),
        Fns.tsStr(col("w.end")).as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
    canon(out)
  }

  val windowAssignSql: String =
    s"""WITH m AS (SELECT max(ts) AS max_ts FROM events)
       |SELECT
       |  strftime(time_bucket(INTERVAL 6 HOUR, ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       |  strftime(time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS window_end,
       |  event_type, count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM events, m
       |WHERE time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR <= max_ts - INTERVAL 6 HOUR
       |GROUP BY 1, 2, 3
       |${canonOrderSql(Seq("window_start", "window_end", "event_type", "n_events", "total_value"))}""".stripMargin

  /** Sliding event-time windows: 6-hour windows advancing every 3
    * hours, so each event lands in exactly two overlapping windows —
    * the smoothing variant of `window_assign`'s tumbling face (rates
    * computed on overlapping windows don't jump at bucket edges).
    * Spark's `window(ts, "6 hours", "3 hours")` generates the
    * per-event window set natively; the oracle reproduces it as the
    * union of the two 3h-aligned starts covering each event.
    *
    * Scale: the explode is a fixed ×(size/slide) factor (2 here), then
    * one aggregation keyed by (window, type) — same shuffle shape as
    * the tumbling face, input × overlap rows instead of input rows.
    */
  /** The sliding aggregation shared by the batch query, the streaming
    * face (streaming.SlidingWindowStream), and the spec's batch twin —
    * one definition so "stream agrees with batch" can never pin a
    * stale copy. Output keeps the raw window struct as `w`.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double")
          .as("total_value"))

  def slidingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val out = slidingCounts(load(spark, sfDir, "events"))
      .select(
        Fns.tsStr(col("w.start")).as("window_start"),
        Fns.tsStr(col("w.end")).as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
    canon(out)
  }

  val slidingWindowSql: String =
    s"""WITH ws AS (
       |  SELECT event_type, value, time_bucket(INTERVAL 3 HOUR, ts) AS w_start
       |  FROM events
       |  UNION ALL
       |  SELECT event_type, value,
       |    time_bucket(INTERVAL 3 HOUR, ts) - INTERVAL 3 HOUR AS w_start
       |  FROM events
       |)
       |SELECT
       |  strftime(w_start, '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       |  strftime(w_start + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS window_end,
       |  event_type, count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM ws
       |GROUP BY 1, 2, 3
       |${canonOrderSql(Seq("window_start", "window_end", "event_type",
         "n_events", "total_value"))}""".stripMargin

  /** Event-time interval join (click→purchase attribution): every
    * purchase within 1 hour AFTER a click by the same user. The batch
    * face of the stream-stream interval join in
    * graft.streaming.AttributionStream (spec asserts agreement). The
    * plan is an equi-join on user_id with the time range as a residual
    * predicate — at scale one shuffle keyed on user_id, no theta join.
    */
  def clickAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val out = clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        Fns.tsStr(col("click_ts")).as("click_ts_str"),
        Fns.tsStr(col("purchase_ts")).as("purchase_ts_str"))
    canon(out)
  }

  val clickAttributionSql: String =
    s"""SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts_str,
       |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts_str
       |FROM events c JOIN events p
       |  ON c.user_id = p.user_id
       | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
       |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
       |${canonOrderSql(Seq("user_id", "click_id", "purchase_id",
         "click_ts_str", "purchase_ts_str"))}""".stripMargin

  /** Bounded-frame running aggregates: per user, the trailing-5-event
    * sum/mean/peak of `value` in event-time order — the rolling feature
    * every fraud/engagement model derives from an event stream. The
    * frame is ROWS-bounded (not RANGE), so memory per key is O(frame)
    * and the window never buffers a whole partition. Sums cross rows in
    * DECIMAL (exact, order-free); the mean divides once at the end.
    * (tus, event_id) ordering makes equal-time events deterministic.
    *
    * Scale: one shuffle + sort keyed by user_id; all three frames share
    * the single Window operator.
    */
  def rollingStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"),
        col("value").cast("decimal(14,2)").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(-4, 0)
    val out = e
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_5", sum(col("v")).over(w))
      .withColumn("max_5", max(col("v")).over(w))
      .select(col("event_id"), col("user_id"), col("tus"),
        col("sum_5").cast("double").as("sum_5"),
        (col("sum_5").cast("double") / col("n_win").cast("double")).as("avg_5"),
        col("max_5").cast("double").as("max_5"),
        col("n_win"))
    canon(out)
  }

  val rollingStatsSql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS tus,
       |    CAST(value AS DECIMAL(14,2)) AS v
       |  FROM events
       |), r AS (
       |  SELECT event_id, user_id, tus,
       |    count(*) OVER w AS n_win,
       |    sum(v) OVER w AS sum_5,
       |    max(v) OVER w AS max_5
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
       |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_id, user_id, tus,
       |  CAST(sum_5 AS DOUBLE) AS sum_5,
       |  CAST(sum_5 AS DOUBLE) / CAST(n_win AS DOUBLE) AS avg_5,
       |  CAST(max_5 AS DOUBLE) AS max_5, n_win
       |FROM r
       |${canonOrderSql(Seq("event_id", "user_id", "tus", "sum_5", "avg_5",
         "max_5", "n_win"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_assign" -> windowAssign,
    "click_attribution" -> clickAttribution,
    "rolling_stats" -> rollingStats,
    "sliding_window" -> slidingWindow)

  val oracles: Map[String, String] = Map(
    "window_assign" -> windowAssignSql,
    "click_attribution" -> clickAttributionSql,
    "rolling_stats" -> rollingStatsSql,
    "sliding_window" -> slidingWindowSql)
}
