package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.{canon, canonOrderSql, load}

/** Extended aggregation surface + remaining small operator families:
  * P2 schema padding, A2/A6/A7 metadata extraction, the NetSuite
  * inventory rollup shape (J6, DECIMAL(10,2)), and ROLLUP grouping sets
  * (exposed by our engine beyond reference parity — SURVEY.md §2.4).
  */
object Rollups {

  /** P2: defensive schema padding — required columns absent from the
    * input materialize as empty strings (reference utils.py:35-41).
    * `action_taken` and `comment` don't exist on events → padded.
    */
  def schemaPadding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val required = Seq("event_id", "event_type", "action_taken", "comment")
    canon(Tables.ensureColumns(e, required))
  }

  val schemaPaddingSql: String =
    s"""SELECT event_id, event_type, '' AS action_taken, '' AS comment
       |FROM events
       |${canonOrderSql(Seq("event_id", "event_type", "action_taken", "comment"))}""".stripMargin

  /** A2/A6/A7 (+A3 guard): per-lot metadata extraction — deterministic
    * first-value (min), full distinct-set as sorted CSV, row count, and
    * the multi-status consistency flag. Replaces the reference's
    * nondeterministic unique()[0]/iloc[0] (SURVEY.md §7.4.1).
    */
  def lotMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val out = e.groupBy((col("user_id") % 10).cast("string").as("lot"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("event_type")).as("first_type"),
        array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("all_types"),
        when(countDistinct(col("event_type")) > 1, 1).otherwise(0)
          .as("inconsistent"))
    canon(out)
  }

  val lotMetadataSql: String =
    s"""SELECT CAST(user_id % 10 AS VARCHAR) AS lot,
       |  count(*) AS n_records,
       |  min(event_type) AS first_type,
       |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS all_types,
       |  CASE WHEN count(DISTINCT event_type) > 1 THEN 1 ELSE 0 END AS inconsistent
       |FROM events GROUP BY 1
       |${canonOrderSql(Seq("lot", "n_records", "first_type", "all_types", "inconsistent"))}""".stripMargin

  /** J6 analog: the NetSuite inventory rollup — item-location joins with
    * DECIMAL(10,2) quantity measures (reference inventory_data.py:49-82).
    */
  def inventoryRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val s = load(spark, sfDir, "supplier")
    val n = load(spark, sfDir, "nation")
    val qty = col("l_quantity").cast("decimal(10,2)")
    val zero = lit(0).cast("decimal(10,2)")
    val out = li
      // supplier scales with SF — no forced hint; size stats / AQE decide
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(s("s_name").as("supplier_name"), n("n_name").as("location"))
      .agg(
        sum(when(col("l_linestatus") === "O", qty).otherwise(zero))
          .cast("double").as("quantity_available"),
        sum(when(col("l_linestatus") === "F", qty).otherwise(zero))
          .cast("double").as("quantity_on_hand"),
        sum(when(col("l_returnflag") === "R", qty).otherwise(zero))
          .cast("double").as("quantity_backordered"))
    canon(out)
  }

  val inventoryRollupSql: String =
    s"""SELECT s.s_name AS supplier_name, n.n_name AS location,
       |  CAST(sum(CASE WHEN l.l_linestatus = 'O' THEN CAST(l.l_quantity AS DECIMAL(10,2)) ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS quantity_available,
       |  CAST(sum(CASE WHEN l.l_linestatus = 'F' THEN CAST(l.l_quantity AS DECIMAL(10,2)) ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS quantity_on_hand,
       |  CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN CAST(l.l_quantity AS DECIMAL(10,2)) ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS quantity_backordered
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |GROUP BY 1, 2
       |${canonOrderSql(Seq("supplier_name", "location", "quantity_available",
         "quantity_on_hand", "quantity_backordered"))}""".stripMargin

  /** ROLLUP grouping sets: region → nation → total revenue hierarchy with
    * explicit grouping-level flags (beyond-parity surface; Spark and
    * DuckDB both implement ANSI ROLLUP).
    */
  def salesRollupCube(spark: SparkSession, sfDir: String): DataFrame = {
    val o = load(spark, sfDir, "orders")
    val c = load(spark, sfDir, "customer")
    val n = load(spark, sfDir, "nation")
    val r = load(spark, sfDir, "region")
    val price = col("o_totalprice").cast("decimal(14,2)")
    val base = o
      // customer scales with SF — no forced hint; size stats / AQE decide
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("rn"), n("n_name").as("nn"), price.as("p"))
    val out = base
      .rollup(col("rn"), col("nn"))
      .agg(sum(col("p")).cast("double").as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping(col("rn")).as("g_region"),
        grouping(col("nn")).as("g_nation"))
      .select(
        coalesce(col("rn"), lit("(all)")).as("region_name"),
        coalesce(col("nn"), lit("(all)")).as("nation_name"),
        col("total_price"), col("n_orders"),
        col("g_region").cast("int").as("g_region"),
        col("g_nation").cast("int").as("g_nation"))
    canon(out)
  }

  val salesRollupCubeSql: String =
    s"""SELECT
       |  coalesce(r.r_name, '(all)') AS region_name,
       |  coalesce(n.n_name, '(all)') AS nation_name,
       |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       |  count(*) AS n_orders,
       |  CAST(GROUPING(r.r_name) AS INT) AS g_region,
       |  CAST(GROUPING(n.n_name) AS INT) AS g_nation
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY ROLLUP (r.r_name, n.n_name)
       |${canonOrderSql(Seq("region_name", "nation_name", "total_price",
         "n_orders", "g_region", "g_nation"))}""".stripMargin

  /** Explicit GROUPING SETS — the third ANSI grouping-analytics face
    * beside ROLLUP (`sales_rollup_cube`) and plain GROUP BY: per-region
    * totals, per-nation totals, and the grand total in ONE pass (no
    * union of three aggregations, no triple scan), disambiguated by
    * grouping flags. Spark 4's `Dataset.groupingSets` maps 1:1 to the
    * DuckDB clause.
    */
  def salesGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val o = load(spark, sfDir, "orders")
    val c = load(spark, sfDir, "customer")
    val n = load(spark, sfDir, "nation")
    val r = load(spark, sfDir, "region")
    val price = col("o_totalprice").cast("decimal(14,2)")
    val base = o
      // customer scales with SF — no forced hint; size stats / AQE decide
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("rn"), n("n_name").as("nn"), price.as("p"))
    val out = base
      .groupingSets(Seq(Seq(col("rn")), Seq(col("nn")), Seq()),
        col("rn"), col("nn"))
      .agg(sum(col("p")).cast("double").as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping(col("rn")).as("g_region"),
        grouping(col("nn")).as("g_nation"))
      .select(
        coalesce(col("rn"), lit("(all)")).as("region_name"),
        coalesce(col("nn"), lit("(all)")).as("nation_name"),
        col("total_price"), col("n_orders"),
        col("g_region").cast("int").as("g_region"),
        col("g_nation").cast("int").as("g_nation"))
    canon(out)
  }

  val salesGroupingSetsSql: String =
    s"""SELECT
       |  coalesce(r.r_name, '(all)') AS region_name,
       |  coalesce(n.n_name, '(all)') AS nation_name,
       |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       |  count(*) AS n_orders,
       |  CAST(GROUPING(r.r_name) AS INT) AS g_region,
       |  CAST(GROUPING(n.n_name) AS INT) AS g_nation
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
       |${canonOrderSql(Seq("region_name", "nation_name", "total_price",
         "n_orders", "g_region", "g_nation"))}""".stripMargin

  /** Approximate distinct (HLL). The raw sketch estimate is
    * engine-specific, so it is not emitted directly; instead the query
    * emits the exact distinct count (oracle-checkable) plus `hll_ok` — a
    * deterministic flag asserting the HLL estimate landed within 10% of
    * exact. The oracle claims hll_ok=1 for every group, so a Spark-side
    * HLL regression hash-mismatches instead of hiding behind a rows-only
    * check. The spec additionally bounds the relative error directly.
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val out = e.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        // exact=0 → the ratio is NaN; an estimate of 0 on 0 distinct is
        // perfect, so pass it explicitly instead of failing the flag
        when(col("exact_users") === 0, when(col("approx_users") === 0, 1).otherwise(0))
          .otherwise(
            when(abs(col("approx_users") - col("exact_users"))
              .cast("double") / col("exact_users").cast("double") <= 0.1, 1)
              .otherwise(0))
          .as("hll_ok"))
    canon(out)
  }

  val approxDistinctSql: String =
    s"""SELECT event_type, count(DISTINCT user_id) AS exact_users,
       |  count(*) AS n_events, 1 AS hll_ok
       |FROM events GROUP BY 1
       |${canonOrderSql(Seq("event_type", "exact_users", "n_events", "hll_ok"))}""".stripMargin

  /** Incremental-rollup maintenance: DAILY partial aggregates re-merged
    * to the MONTHLY grain — sums add, counts add, and the mean is
    * re-derived from the merged sums (never averaged-over-averages —
    * the mergeability discipline that makes a rollup incrementally
    * maintainable without rescanning facts). The oracle computes the
    * monthly rollup DIRECTLY from lineitem, so the driver's hash check
    * IS the merge-equals-direct proof. All arithmetic exact: DECIMAL
    * sums, µ-unit integer mean.
    *
    * Scale: this is the materialized-view pattern — the daily relation
    * is what a 100 TB pipeline persists per load; the monthly merge
    * aggregates |days|×|flags| rows, not facts. Two narrow shuffles.
    */
  def rollupMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val daily = li.groupBy(
        to_date(col("l_shipdate")).as("d"), col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(14,2)")).as("q"),
        count(lit(1)).as("n"))
    val out = daily.groupBy(
        date_format(col("d"), "yyyy-MM").as("ship_month"),
        col("l_returnflag"))
      .agg(sum(col("q")).cast("double").as("sum_qty"),
        sum(col("n")).as("n_lines"),
        expr("(cast(sum(q) * 100 as bigint) * 10000) div sum(n)")
          .as("avg_qty_micro"))
    canon(out)
  }

  /** Deliberately the DIRECT single-pass formulation — no daily stage.
    * Exact DECIMAL sums are associative, so the Spark side's
    * daily→monthly merge must hash-match this or the merge is wrong.
    */
  val rollupMergeSql: String =
    s"""SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
       |  l_returnflag,
       |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
       |  count(*) AS n_lines,
       |  CAST((CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) * 100 AS BIGINT)
       |    * 10000) // count(*) AS BIGINT) AS avg_qty_micro
       |FROM lineitem GROUP BY 1, 2
       |${canonOrderSql(Seq("ship_month", "l_returnflag", "sum_qty",
         "n_lines", "avg_qty_micro"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_padding" -> schemaPadding,
    "lot_metadata" -> lotMetadata,
    "inventory_rollup" -> inventoryRollup,
    "sales_rollup_cube" -> salesRollupCube,
    "sales_grouping_sets" -> salesGroupingSets,
    "approx_distinct" -> approxDistinct,
    "rollup_merge" -> rollupMerge)

  val oracles: Map[String, String] = Map(
    "schema_padding" -> schemaPaddingSql,
    "lot_metadata" -> lotMetadataSql,
    "inventory_rollup" -> inventoryRollupSql,
    "sales_rollup_cube" -> salesRollupCubeSql,
    "sales_grouping_sets" -> salesGroupingSetsSql,
    "approx_distinct" -> approxDistinctSql,
    "rollup_merge" -> rollupMergeSql)
}
