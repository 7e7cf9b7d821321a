package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** Relational core — one query per operator family from SURVEY.md §2.2-§2.6.
  *
  * Determinism rules shared with the DuckDB oracles:
  *  - outputs end with the canonical name-sorted ORDER BY (NULLS FIRST);
  *  - money/quantity aggregates use exact DECIMAL arithmetic, cast to
  *    DOUBLE last;
  *  - timestamps are emitted as formatted strings, never raw.
  */
object Core {

  /** P5-P9: predicate stack — IN-list, range, timestamp floor, negated
    * prefix match (the reference's VOD_ system-user drop, bulk_fetch.py:158).
    * All four predicates reach the parquet scan as PushedFilters.
    */
  def eventsFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val out = e.filter(
      col("event_type").isin("click", "view") &&
        col("value") > 10.0 &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        !col("props").startsWith("{\"k\": 9"))
      .select(col("event_id"), Fns.tsStr(col("ts")).as("ts_str"),
        col("user_id"), col("event_type"), col("value"))
    canon(out)
  }

  val eventsFilteredSql: String =
    s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       |  user_id, event_type, value
       |FROM events
       |WHERE event_type IN ('click', 'view') AND value > 10
       |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
       |  AND NOT (props LIKE '{"k": 9%')
       |${canonOrderSql(Seq("event_id", "ts_str", "user_id", "event_type", "value"))}""".stripMargin

  /** J1-J4: the widening-key left-join hierarchy chain with join-failure
    * degrade (reference bulk_fetch.py:114-137): unmatched levels become ''.
    * Dims are broadcast — no shuffle of the probe side.
    */
  def hierarchyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = load(spark, sfDir, "customer")
    val n = load(spark, sfDir, "nation").filter(col("n_nationkey") < 20)
    val r = load(spark, sfDir, "region").filter(col("r_regionkey") < 4)
    val out = c
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        c("c_custkey").as("custkey"),
        c("c_name").as("customer_name"),
        coalesce(n("n_name"), lit("")).as("nation_name"),
        coalesce(r("r_name"), lit("")).as("region_name"))
    canon(out)
  }

  val hierarchyJoinSql: String =
    s"""SELECT c.c_custkey AS custkey, c.c_name AS customer_name,
       |  coalesce(n.n_name, '') AS nation_name,
       |  coalesce(r.r_name, '') AS region_name
       |FROM customer c
       |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
       |  ON c.c_nationkey = n.n_nationkey
       |LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 4) r
       |  ON n.n_regionkey = r.r_regionkey
       |${canonOrderSql(Seq("custkey", "customer_name", "nation_name", "region_name"))}""".stripMargin

  /** J5 (deterministic rewrite): scalar metadata stamped onto every row as
    * a 1-row broadcast cross join. The reference's `unique()[0]` picks an
    * arbitrary value (bulk_fetch.py:106-109); we stamp min() instead —
    * documented semantic upgrade (SURVEY.md §7.4.1).
    */
  def scalarStamp(spark: SparkSession, sfDir: String): DataFrame = {
    val n = load(spark, sfDir, "nation")
    val meta = load(spark, sfDir, "region")
      .agg(min(col("r_name")).as("stamp_region"),
        count(lit(1)).as("n_regions"))
    val out = n.crossJoin(broadcast(meta))
      .select(n("n_nationkey").as("nationkey"), n("n_name").as("nation_name"),
        col("stamp_region"), col("n_regions"))
    canon(out)
  }

  val scalarStampSql: String =
    s"""SELECT n_nationkey AS nationkey, n_name AS nation_name,
       |  (SELECT min(r_name) FROM region) AS stamp_region,
       |  (SELECT count(*) FROM region) AS n_regions
       |FROM nation
       |${canonOrderSql(Seq("nationkey", "nation_name", "stamp_region", "n_regions"))}""".stripMargin

  /** J8: enrichment inner join (fact ⋈ product dim) + grouped rollup. */
  def enrichmentJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val p = load(spark, sfDir, "part")
    // part scales with SF — no forced hint; size stats / AQE decide
    val out = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(p("p_brand").as("brand"), p("p_type").as("ptype"))
      .agg(
        sum(li("l_quantity").cast("decimal(14,2)")).cast("double").as("total_qty"),
        count(lit(1)).as("n_lines"))
    canon(out)
  }

  val enrichmentJoinSql: String =
    s"""SELECT p.p_brand AS brand, p.p_type AS ptype,
       |  CAST(sum(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty,
       |  count(*) AS n_lines
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |GROUP BY 1, 2
       |${canonOrderSql(Seq("brand", "ptype", "total_qty", "n_lines"))}""".stripMargin

  /** A1: distinct set semantics (reference data_processor.py:35). */
  def distinctIds(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    canon(e.filter(col("event_type") === "signup")
      .select(col("user_id")).distinct())
  }

  val distinctIdsSql: String =
    s"""SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
       |${canonOrderSql(Seq("user_id"))}""".stripMargin

  /** A3: count-distinct consistency guard (data_processor.py:120). */
  def countDistinctGuard(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val out = e.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_types"))
      .filter(col("n_types") > 1)
    canon(out)
  }

  val countDistinctGuardSql: String =
    s"""SELECT user_id, count(DISTINCT event_type) AS n_types
       |FROM events GROUP BY user_id HAVING count(DISTINCT event_type) > 1
       |${canonOrderSql(Seq("user_id", "n_types"))}""".stripMargin

  /** A5 + F10: conditional (pivot-style) aggregation with sign flip
    * (reference sales_data.py:61-63).
    */
  def conditionalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val price = col("l_extendedprice").cast("decimal(14,2)")
    val zero = lit(0).cast("decimal(14,2)")
    val out = li.groupBy(col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"))
      .agg(
        sum(when(col("l_linestatus") === "F", price).otherwise(zero))
          .cast("double").as("amount_f"),
        (-sum(when(col("l_returnflag") === "R", price).otherwise(zero))
          .cast("double")).as("neg_amount_r"),
        count(lit(1)).as("n"))
    canon(out)
  }

  val conditionalAggSql: String =
    s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS amount_f,
       |  -CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS neg_amount_r,
       |  count(*) AS n
       |FROM lineitem GROUP BY 1, 2
       |${canonOrderSql(Seq("returnflag", "linestatus", "amount_f", "neg_amount_r", "n"))}""".stripMargin

  /** U1: union-append (reference pd.concat / status-row append). */
  def unionAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val high = e.filter(col("value") > 30.0)
      .select(col("event_id"), col("user_id"), lit("high").as("bucket"))
    val errs = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), lit("error").as("bucket"))
    canon(high.unionByName(errs))
  }

  val unionAppendSql: String =
    s"""SELECT event_id, user_id, 'high' AS bucket FROM events WHERE value > 30
       |UNION ALL
       |SELECT event_id, user_id, 'error' AS bucket FROM events WHERE event_type = 'error'
       |${canonOrderSql(Seq("event_id", "user_id", "bucket"))}""".stripMargin

  /** P10/T5: dedup-guard as left-anti join — (user, day) pairs that
    * clicked but never purchased that day (reference status_tracker.py:34-41
    * "skip if already Success").
    */
  def antiJoinGuard(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), Fns.dayStr(col("ts")).as("day")).distinct()
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), Fns.dayStr(col("ts")).as("day")).distinct()
    canon(clicks.join(purchases, Seq("user_id", "day"), "left_anti"))
  }

  val antiJoinGuardSql: String =
    s"""SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
       |FROM events e WHERE event_type = 'click'
       |AND NOT EXISTS (
       |  SELECT 1 FROM events p WHERE p.event_type = 'purchase'
       |    AND p.user_id = e.user_id
       |    AND strftime(p.ts, '%Y-%m-%d') = strftime(e.ts, '%Y-%m-%d'))
       |${canonOrderSql(Seq("user_id", "day"))}""".stripMargin

  /** W + A7 deterministic rewrite: latest event per user via row_number
    * over (ts DESC, event_id DESC) — the correct fix for the reference's
    * nondeterministic iloc[0] first-row pick (SURVEY.md §2.5).
    */
  def latestEventPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val out = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        Fns.tsStr(col("ts")).as("ts_str"), col("event_type"), col("value"))
    canon(out)
  }

  val latestEventPerUserSql: String =
    s"""SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       |  event_type, value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM events) WHERE rn = 1
       |${canonOrderSql(Seq("user_id", "event_id", "ts_str", "event_type", "value"))}""".stripMargin

  /** F9: conditional suffix strip (reference netsuite_pipeline/
    * sales_data.py:116-124): strip the exact TRAILING corporate suffix via
    * the CASE/LIKE/LEFT/LENGTH shape, leave every other value unchanged.
    * The test corpus has no suffixed names, so the query first decorates
    * c_name deterministically — covering match, non-match, exact-suffix
    * (strips to '') and suffix-in-the-middle (must NOT strip) — then
    * strips; both faces are returned so the oracle checks the transform.
    */
  def suffixStrip(spark: SparkSession, sfDir: String): DataFrame = {
    val suffix = " - Northeast Scientific, Inc."
    val c = load(spark, sfDir, "customer")
    val k = col("c_custkey") % 5
    val decorated = when(k === 0, concat(col("c_name"), lit(suffix)))
      .when(k === 1, concat(col("c_name"), lit(" - Other Corp")))
      .when(k === 2, lit(suffix))
      .when(k === 3, lit(suffix + " tail"))
      .otherwise(col("c_name"))
    val d = c.select(col("c_custkey").as("custkey"), decorated.as("raw_name"))
    val cleaned = when(col("raw_name").endsWith(suffix),
        col("raw_name").substr(lit(1),
          length(col("raw_name")) - lit(suffix.length)))
      .otherwise(col("raw_name"))
    canon(d.select(col("custkey"), col("raw_name"), cleaned.as("clean_name")))
  }

  val suffixStripSql: String =
    s"""WITH d AS (
       |  SELECT c_custkey AS custkey,
       |    CASE CAST(c_custkey % 5 AS INT)
       |      WHEN 0 THEN c_name || ' - Northeast Scientific, Inc.'
       |      WHEN 1 THEN c_name || ' - Other Corp'
       |      WHEN 2 THEN ' - Northeast Scientific, Inc.'
       |      WHEN 3 THEN ' - Northeast Scientific, Inc. tail'
       |      ELSE c_name END AS raw_name
       |  FROM customer)
       |SELECT custkey, raw_name,
       |  CASE WHEN raw_name LIKE '% - Northeast Scientific, Inc.' THEN
       |    LEFT(raw_name, LENGTH(raw_name) - LENGTH(' - Northeast Scientific, Inc.'))
       |  ELSE raw_name END AS clean_name
       |FROM d
       |${canonOrderSql(Seq("custkey", "raw_name", "clean_name"))}""".stripMargin

  /** Source-vs-target reconciliation via FULL OUTER join — the
    * validation every migration/load pipeline runs: roll lineitem up to
    * order grain, full-outer-join against orders, and classify every
    * key as both_equal / both_diff / orders_only / lineitem_only, with
    * the total absolute drift per class. Comparisons and drift stay in
    * exact DECIMAL (a double epsilon-compare would classify
    * nondeterministically); the synthetic totals intentionally disagree,
    * which is the point — reconciliation reports drift, it does not
    * assume consistency.
    *
    * Scale: one rollup + one full-outer shuffle join on the order key,
    * then an aggregation to four rows. The full-outer face is the one
    * join type no other query exercises.
    */
  def reconcile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("li_total"))
    val o = load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_total"))
    val joined = o.join(li, col("o_orderkey") === col("l_orderkey"), "full_outer")
    val status = when(col("o_orderkey").isNull, "lineitem_only")
      .when(col("l_orderkey").isNull, "orders_only")
      .when(col("o_total") === col("li_total"), "both_equal")
      .otherwise("both_diff")
    val out = joined.select(status.as("status"),
        abs(coalesce(col("o_total"), lit(0)).cast("decimal(28,2)") -
          coalesce(col("li_total"), lit(0)).cast("decimal(28,2)")).as("drift"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("drift")).cast("double").as("total_drift"))
    canon(out)
  }

  val reconcileSql: String =
    s"""WITH li AS (
       |  SELECT l_orderkey,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS li_total
       |  FROM lineitem GROUP BY l_orderkey
       |), o AS (
       |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_total
       |  FROM orders
       |), j AS (
       |  SELECT o.o_orderkey, li.l_orderkey, o.o_total, li.li_total,
       |    CASE WHEN o.o_orderkey IS NULL THEN 'lineitem_only'
       |         WHEN li.l_orderkey IS NULL THEN 'orders_only'
       |         WHEN o.o_total = li.li_total THEN 'both_equal'
       |         ELSE 'both_diff' END AS status
       |  FROM o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
       |)
       |SELECT status, count(*) AS n_orders,
       |  CAST(sum(abs(CAST(coalesce(o_total, 0) AS DECIMAL(28,2)) -
       |                CAST(coalesce(li_total, 0) AS DECIMAL(28,2)))) AS DOUBLE)
       |    AS total_drift
       |FROM j GROUP BY status
       |${canonOrderSql(Seq("status", "n_orders", "total_drift"))}""".stripMargin

  /** INTERSECT / EXCEPT set algebra (the §2.6 faces beyond U1's union)
    * on a COMPOSITE key: user-days with a click vs user-days with a
    * purchase — days where a user clicked AND bought, and days where
    * they clicked but did not. (User grain alone is vacuous at any
    * realistic density — every user eventually does everything; the
    * day-sliced question is the one funnels actually ask.) Spark's
    * `intersect`/`except` are DISTINCT set semantics — planned as
    * aggregate + semi/anti join, one shuffle per leg over pre-pruned
    * single-type scans (the event_type filters push to parquet).
    */
  def setCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    def userDays(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val clicks = userDays("click")
    val buys   = userDays("purchase")
    val out = clicks.intersect(buys)
      .withColumn("relation", lit("click_and_purchase"))
      .unionByName(clicks.except(buys)
        .withColumn("relation", lit("click_only")))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("relation"))
    canon(out)
  }

  val setCompareSql: String =
    s"""WITH c AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
       |           FROM events WHERE event_type = 'click'),
       |p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
       |      FROM events WHERE event_type = 'purchase'),
       |both_rel AS (
       |  SELECT user_id, day, 'click_and_purchase' AS relation
       |  FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
       |), only_rel AS (
       |  SELECT user_id, day, 'click_only' AS relation
       |  FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
       |)
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, relation
       |  FROM both_rel
       |UNION ALL
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, relation
       |  FROM only_rel
       |${canonOrderSql(Seq("user_id", "day", "relation"))}""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): two
    * per-bucket aggregates joined on a NULLABLE bucket key — the
    * unknown-segment rows (key = NULL) must pair up, which a plain
    * equi-join silently drops (NULL = NULL is not true). The nullable
    * key is derived deterministically (user_id ≡ 0 mod 10 → NULL) so
    * both engines build identical buckets.
    *
    * Scale: same shape as any agg-agg join — two pushed-down scans,
    * per-bucket partials, one bounded-cardinality join. Spark plans
    * `<=>` as a hash join key (null-safe equality is hashable), NOT a
    * nested loop, so the shape survives scale like any equi-join.
    */
  def nullsafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val bucket = when(col("user_id") % 10 === 0, lit(null))
      .otherwise(col("user_id") % 10)
    def leg(t: String, out: String) = e
      .filter(col("event_type") === t)
      .select(bucket.cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    val c = leg("click", "n_click")
    val p = leg("purchase", "n_buy").withColumnRenamed("bucket", "pb")
    val out = c.join(p, col("bucket") <=> col("pb"))
      .select(col("bucket"), col("n_click"), col("n_buy"))
    canon(out)
  }

  val nullsafeJoinSql: String =
    s"""WITH c AS (
       |  SELECT CASE WHEN user_id % 10 = 0 THEN NULL
       |              ELSE user_id % 10 END AS bucket,
       |    count(*) AS n_click
       |  FROM events WHERE event_type = 'click' GROUP BY 1
       |), p AS (
       |  SELECT CASE WHEN user_id % 10 = 0 THEN NULL
       |              ELSE user_id % 10 END AS pb,
       |    count(*) AS n_buy
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1
       |)
       |SELECT c.bucket, c.n_click, p.n_buy
       |FROM c JOIN p ON c.bucket IS NOT DISTINCT FROM p.pb
       |${canonOrderSql(Seq("bucket", "n_click", "n_buy"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_compare" -> setCompare,
    "nullsafe_join" -> nullsafeJoin,
    "reconcile" -> reconcile,
    "suffix_strip" -> suffixStrip,
    "events_filtered" -> eventsFiltered,
    "hierarchy_join" -> hierarchyJoin,
    "scalar_stamp" -> scalarStamp,
    "enrichment_join" -> enrichmentJoin,
    "distinct_ids" -> distinctIds,
    "count_distinct_guard" -> countDistinctGuard,
    "conditional_agg" -> conditionalAgg,
    "union_append" -> unionAppend,
    "anti_join_guard" -> antiJoinGuard,
    "latest_event_per_user" -> latestEventPerUser)

  val oracles: Map[String, String] = Map(
    "set_compare" -> setCompareSql,
    "nullsafe_join" -> nullsafeJoinSql,
    "reconcile" -> reconcileSql,
    "suffix_strip" -> suffixStripSql,
    "events_filtered" -> eventsFilteredSql,
    "hierarchy_join" -> hierarchyJoinSql,
    "scalar_stamp" -> scalarStampSql,
    "enrichment_join" -> enrichmentJoinSql,
    "distinct_ids" -> distinctIdsSql,
    "count_distinct_guard" -> countDistinctGuardSql,
    "conditional_agg" -> conditionalAggSql,
    "union_append" -> unionAppendSql,
    "anti_join_guard" -> antiJoinGuardSql,
    "latest_event_per_user" -> latestEventPerUserSql)
}
