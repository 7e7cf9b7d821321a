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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoin,
    "event_pivot" -> eventPivot,
    "value_median" -> valueMedian,
    "approx_quantiles" -> approxQuantiles)

  val oracles: Map[String, String] = Map(
    "asof_join" -> asofJoinSql,
    "event_pivot" -> eventPivotSql,
    "value_median" -> valueMedianSql,
    "approx_quantiles" -> approxQuantilesSql)
}
