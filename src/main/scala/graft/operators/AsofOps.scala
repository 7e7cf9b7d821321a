package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** Operators Spark lacks natively, composed scalably from built-ins
  * (SURVEY.md §2.3 "absent in reference" gap — beyond-parity surface).
  */
object AsofOps {

  /** As-of join: each event picks the latest order of the same customer
    * at-or-before the event timestamp.
    *
    * Implementation is the union-and-carry pattern — the scale-correct
    * as-of: tag both sides, sort within key by time, and carry the last
    * seen order attribute forward with last_value(ignoreNulls) over a
    * running window. ONE shuffle on the join key, no per-row probe, no
    * range-join explosion; works at any key cardinality.
    *
    * Orders are pre-deduped to (custkey, date) → max orderkey so the
    * match is unambiguous (DuckDB ASOF tie behavior is unspecified).
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val o = load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("ots"))
      .agg(max(col("o_orderkey")).as("okey"))

    val eTagged = e.select(
      col("user_id").as("key"), col("ts"),
      lit(1).as("is_event"), col("event_id"),
      lit(null).cast("long").as("okey"),
      lit(null).cast("timestamp").as("ots"))
    val oTagged = o.select(
      col("key"), col("ots").as("ts"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
      col("okey"), col("ots"))

    // order rows sort before events at the same instant (is_event asc)
    // so an order dated exactly at the event time IS matched ("<=").
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("is_event"), col("okey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = eTagged.unionByName(oTagged)
      .withColumn("matched_okey", last(col("okey"), ignoreNulls = true).over(w))
      .withColumn("matched_ots", last(col("ots"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(
        col("event_id"), col("key").as("user_id"),
        Fns.tsStr(col("ts")).as("ts_str"),
        coalesce(col("matched_okey"), lit(-1L)).as("order_key"),
        coalesce(Fns.dayStr(col("matched_ots")), lit("none")).as("order_date"))
    canon(out)
  }

  val asofJoinSql: String =
    s"""WITH ord AS (
       |  SELECT o_custkey AS key, o_orderdate AS ots, max(o_orderkey) AS okey
       |  FROM orders GROUP BY 1, 2
       |)
       |SELECT e.event_id, e.user_id,
       |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       |  coalesce(o.okey, -1) AS order_key,
       |  coalesce(strftime(o.ots, '%Y-%m-%d'), 'none') AS order_date
       |FROM events e
       |ASOF LEFT JOIN ord o ON e.user_id = o.key AND o.ots <= e.ts
       |${canonOrderSql(Seq("event_id", "user_id", "ts_str", "order_key", "order_date"))}""".stripMargin

  /** Pivot: per-user event-type count matrix (Spark .pivot ↔ conditional
    * aggregation in the oracle).
    */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val types = Seq("click", "view", "purchase", "signup", "error")
    val out = e.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
    canon(out)
  }

  val eventPivotSql: String = {
    val cols = Seq("click", "view", "purchase", "signup", "error")
    val measures = cols.map(t =>
      s"""sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)::BIGINT AS "$t"""")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $measures
       |FROM events GROUP BY 1
       |${canonOrderSql(Seq("user_id") ++ cols)}""".stripMargin
  }

  /** Discrete median (rank-based, no interpolation — engine-independent):
    * the value at row ceil(n/2) ordered by (value, event_id).
    */
  def valueMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val out = e
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === ((col("n") + 1) / 2).cast("long"))
      .select(col("event_type"), col("value").as("median_value"),
        col("n").as("n_events"))
    canon(out)
  }

  val valueMedianSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value, event_id,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |)
       |SELECT event_type, value AS median_value, n AS n_events
       |FROM ranked WHERE rn = (n + 1) // 2
       |${canonOrderSql(Seq("event_type", "median_value", "n_events"))}""".stripMargin

  /** Quantile family: exact p25/p50/p75/p95 per event type (rank-based,
    * integer ceil-div targets — bit-identical across engines) plus
    * `sketch_ok`, asserting Spark's `approx_percentile` t-digest landed
    * within its rank guarantee. Ties make "the rank of the estimate" an
    * interval, so the check is two-sided: the estimate's rank interval
    * [count(< est)+1, count(<= est)] must intersect the target window
    * rank(q·n) ± (n/accuracy + 1). The oracle claims sketch_ok=1 for
    * every group, so a sketch regression hash-mismatches instead of
    * hiding behind a rows-only check (the approx_distinct pattern).
    */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wn = Window.partitionBy(col("event_type"))
    val ranked = e
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
    val qCols = Seq(25 -> "p25", 50 -> "p50", 75 -> "p75", 95 -> "p95").map {
      case (p, name) =>
        max(when(col("rn") ===
          greatest(lit(1L), expr(s"(n * $p + 99) div 100")), col("value")))
          .as(name)
    }
    val exact = ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"), qCols: _*)
    val ap = e.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("ap50"))
    val cnts = e.join(ap, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("value") < col("ap50"), 1L).otherwise(0L)).as("below"),
        sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)).as("at_most"))
    val target = expr("(n_events * 50 + 99) div 100")
    val eps = expr("n_events div 1000 + 1")
    val out = exact.join(cnts, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        col("p25"), col("p50"), col("p75"), col("p95"),
        when(col("below") + 1 <= target + eps && col("at_most") >= target - eps, 1)
          .otherwise(0).as("sketch_ok"))
    canon(out)
  }

  val approxQuantilesSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value, event_id,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |)
       |SELECT event_type, max(n) AS n_events,
       |  max(CASE WHEN rn = greatest(1, (n * 25 + 99) // 100) THEN value END) AS p25,
       |  max(CASE WHEN rn = greatest(1, (n * 50 + 99) // 100) THEN value END) AS p50,
       |  max(CASE WHEN rn = greatest(1, (n * 75 + 99) // 100) THEN value END) AS p75,
       |  max(CASE WHEN rn = greatest(1, (n * 95 + 99) // 100) THEN value END) AS p95,
       |  1 AS sketch_ok
       |FROM ranked GROUP BY event_type
       |${canonOrderSql(Seq("event_type", "n_events", "p25", "p50", "p75", "p95", "sketch_ok"))}""".stripMargin

  // ---------------------------------------------------------------------
  // resample_fill — fixed-grid resampling with forward fill
  // ---------------------------------------------------------------------

  /** Grid slot width: 6 hours in epoch-µs (the reference's window). */
  private val slotUs = 6L * 3600 * 1000000

  /** Time-series resampling: each user's irregular event stream becomes
    * a REGULAR 6-hour grid between their first and last event, with the
    * last observed value carried forward across empty slots — the
    * gap-filling step every feature pipeline runs before windowed
    * models, and the one time-series face as-of join doesn't cover
    * (as-of aligns two streams; this REGULARIZES one). Per slot the
    * observation is the max (tus, event_id, value) struct — last write
    * in the slot wins, ties impossible (event_id unique).
    *
    * Scale: per-(user, slot) aggregate with map-side partials, a
    * bounded per-user grid explode (`sequence(min, max)` — slot count,
    * not event count), and one user-keyed window for the forward fill.
    * Nothing materializes the cross of users × global time range: each
    * user's grid spans only their own activity.
    */
  def resampleFill(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
        col("event_id"), col("value"))
      // FLOOR division, not `div` (trunc-toward-zero): a pre-1970 tus
      // must slot into the PRECEDING grid cell, not share a ±6h cell 0
      // with post-epoch events. pmod makes the dividend exactly
      // divisible, so `div` is exact and equals floor on both signs.
      .withColumn("slot", expr(s"(tus - pmod(tus, $slotUs)) div $slotUs"))
    val obs = e.groupBy(col("user_id"), col("slot"))
      .agg(max(struct(col("tus"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("slot"), col("m.value").as("v"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("slot")).as("mn"), max(col("slot")).as("mx"))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx)")).as("slot"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("slot"))
    val out = grid.join(obs, Seq("user_id", "slot"), "left")
      .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("slot"),
        Fns.canonNum(col("v_fill")).as("value_s"),
        when(col("v").isNotNull, 1).otherwise(0).as("is_observed"))
    canon(out)
  }

  val resampleFillSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
       |    (epoch_us(ts) - ((epoch_us(ts) % $slotUs) + $slotUs) % $slotUs)
       |      // $slotUs AS slot
       |  FROM events
       |), r AS (
       |  SELECT user_id, slot, value,
       |    row_number() OVER (PARTITION BY user_id, slot
       |      ORDER BY tus DESC, event_id DESC) AS rn
       |  FROM e
       |), o AS (
       |  SELECT user_id, slot, value AS v FROM r WHERE rn = 1
       |), bounds AS (
       |  SELECT user_id, min(slot) AS mn, max(slot) AS mx
       |  FROM o GROUP BY 1
       |), grid AS (
       |  SELECT user_id, unnest(generate_series(mn, mx)) AS slot
       |  FROM bounds
       |), filled AS (
       |  SELECT g.user_id, g.slot, o.v,
       |    last_value(o.v IGNORE NULLS) OVER (
       |      PARTITION BY g.user_id ORDER BY g.slot
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
       |  FROM grid g LEFT JOIN o ON g.user_id = o.user_id AND g.slot = o.slot
       |)
       |SELECT user_id, slot,
       |  CAST(CAST(v_fill AS DECIMAL(18,2)) AS VARCHAR) AS value_s,
       |  CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS is_observed
       |FROM filled
       |${canonOrderSql(Seq("user_id", "slot", "value_s", "is_observed"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoin,
    "event_pivot" -> eventPivot,
    "value_median" -> valueMedian,
    "approx_quantiles" -> approxQuantiles,
    "resample_fill" -> resampleFill)

  val oracles: Map[String, String] = Map(
    "asof_join" -> asofJoinSql,
    "event_pivot" -> eventPivotSql,
    "value_median" -> valueMedianSql,
    "approx_quantiles" -> approxQuantilesSql,
    "resample_fill" -> resampleFillSql)
}
