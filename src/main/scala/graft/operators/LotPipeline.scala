package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** The MasterControl lot-merge pipeline (reference §3.1: bulk_fetch.py
  * process_record → _merge_data), re-expressed as ONE declarative query
  * over `events` dressed as data-capture records:
  *
  *   filter current (P5) → JSON iteration parse (F12) → sentinel (F5)
  *   → label concat (F4) → metadata stamp (J5) → widening hierarchy
  *   left joins (J1-J3) with '' degrade (J4) → rename to the 14-column
  *   business schema (P3) → trim (F2) → Eastern-time format (F1)
  *   → system-user anti-filter (P8).
  *
  * The reference runs this per-record in a Python loop; here it is one
  * Catalyst plan — dims broadcast, the fact scanned once, fully
  * whole-stage-codegen'd.
  */
object LotPipeline {

  def lotPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val c = load(spark, sfDir, "customer")
    val n = load(spark, sfDir, "nation")
    val r = load(spark, sfDir, "region")

    // P5: "current" filter analog — drop error captures / null values
    val current = e.filter(col("event_type") =!= "error" && col("value").isNotNull)

    // F12 + F5: parse iteration from the JSON payload; k%10==0 plays the
    // missing-iteration case → sentinel -99999
    val kRaw = get_json_object(col("props"), "$.k").cast("int")
    val iter = Fns.sentinelInt(when(kRaw % 10 === 0, lit(null)).otherwise(kRaw))

    // F4: conditional label concat
    val enriched = current
      .withColumn("iteration", iter)
      .withColumn("structure_label",
        Fns.labelWithIteration(col("event_type"), col("iteration")))

    // J5: deterministic scalar metadata stamp (min product name)
    val meta = load(spark, sfDir, "part")
      .agg(min(col("p_name")).as("stamped_product"))

    // J1-J3: widening hierarchy (customer→nation→region as
    // UNIT_PROCEDURE→OPERATION→PHASE) with J4 '' degrade
    val joined = enriched
      // customer scales with SF — no forced hint; size stats / AQE decide
      .join(c, enriched("user_id") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .crossJoin(broadcast(meta))

    // P3: the 14-column business rename (reference bulk_fetch.py:147-151)
    val business = joined.select(
      concat(lit("TPL-"), col("event_type")).as("master_template_name"),
      concat(lit("LOT-"), (col("user_id") % 10).cast("string")).as("lot_number"),
      col("user_id").cast("string").as("product_id"),
      coalesce(n("n_name"), lit("")).as("unit"),
      coalesce(r("r_name"), lit("")).as("operation"),
      coalesce(c("c_mktsegment"), lit("")).as("phase"),
      Fns.reformatEastern(col("ts")).as("data_capture_time"),
      when(col("value") > 50.0, lit("COMPLETE")).otherwise(lit("IN_PROGRESS"))
        .as("production_record_status"),
      col("structure_label"),
      col("event_type").as("description"),
      Fns.canonNum(col("value")).as("input_data_value"),
      concat(lit("user_"), col("user_id").cast("string")).as("performed_by"),
      upper(col("event_type")).as("action_performed"),
      col("stamped_product").as("captured_data_type"),
      col("event_id"))

    // F2 trim + P8 system-user anti-filter (the reference's VOD_ drop)
    val out = graft.Tables.trimAll(business)
      .filter(!col("performed_by").startsWith("user_14"))
    canon(out)
  }

  private val cols = Seq("master_template_name", "lot_number", "product_id",
    "unit", "operation", "phase", "data_capture_time",
    "production_record_status", "structure_label", "description",
    "input_data_value", "performed_by", "action_performed",
    "captured_data_type", "event_id")

  val lotPipelineSql: String =
    s"""WITH cur AS (
       |  SELECT *, CAST(json_extract_string(props, '$$.k') AS INT) AS k_raw
       |  FROM events WHERE event_type <> 'error' AND value IS NOT NULL
       |), enr AS (
       |  SELECT *,
       |    coalesce(CASE WHEN k_raw % 10 = 0 THEN NULL ELSE k_raw END, -99999) AS iteration
       |  FROM cur
       |), lab AS (
       |  SELECT *,
       |    CASE WHEN event_type <> '0' AND iteration <> -99999
       |         THEN event_type || ' - ' || CAST(iteration AS VARCHAR)
       |         ELSE event_type END AS structure_label
       |  FROM enr
       |)
       |SELECT
       |  trim('TPL-' || e.event_type) AS master_template_name,
       |  trim('LOT-' || CAST(e.user_id % 10 AS VARCHAR)) AS lot_number,
       |  trim(CAST(e.user_id AS VARCHAR)) AS product_id,
       |  trim(coalesce(n.n_name, '')) AS unit,
       |  trim(coalesce(r.r_name, '')) AS operation,
       |  trim(coalesce(c.c_mktsegment, '')) AS phase,
       |  trim(strftime(timezone('America/New_York', timezone('UTC', e.ts)), '%-m/%-d/%Y %-H:%M')) AS data_capture_time,
       |  trim(CASE WHEN e.value > 50 THEN 'COMPLETE' ELSE 'IN_PROGRESS' END) AS production_record_status,
       |  trim(e.structure_label) AS structure_label,
       |  trim(e.event_type) AS description,
       |  trim(CAST(CAST(e.value AS DECIMAL(18,2)) AS VARCHAR)) AS input_data_value,
       |  trim('user_' || CAST(e.user_id AS VARCHAR)) AS performed_by,
       |  trim(upper(e.event_type)) AS action_performed,
       |  trim((SELECT min(p_name) FROM part)) AS captured_data_type,
       |  e.event_id
       |FROM lab e
       |LEFT JOIN customer c ON e.user_id = c.c_custkey
       |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
       |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE NOT ('user_' || CAST(e.user_id AS VARCHAR) LIKE 'user_14%')
       |${canonOrderSql(cols)}""".stripMargin

  // ---------------------------------------------------------------------
  // lot_fallback — the ②′ per-record fallback-metadata path, set-oriented
  // ---------------------------------------------------------------------

  /** Records below this value are not "current" metadata captures. */
  private val fallbackValueFloor = 95.0

  /** The reference's per-record fallback protocol (bulk_fetch.py:73-81 +
    * data_processor.py:97-152), re-expressed as ONE set-oriented query
    * instead of a per-lot Python loop:
    *
    *  - primary metadata per lot = the batch-record fetch
    *    (`fetch_batch_records_by_lot`);
    *  - where primary is EMPTY, fall back to the data-capture fetch
    *    (`fetch_data_capture_by_lot`), whose differently-named fields
    *    are renamed into the primary schema (the reference's
    *    masterTemplateName→productName / productionRecordStatus→status
    *    rename — here the BR-/TPL- product prefixes make the source
    *    face visible);
    *  - lots where BOTH are empty emit status "Fail" with the
    *    reference's exact message into the status relation
    *    (`status_tracker.log_status`), folded into the same output.
    *
    * On the test data: purchases above the value floor play the primary
    * batch records, views above it the fallback captures; lots with
    * neither exercise the both-empty Fail path (all three classes are
    * non-empty at every test SF).
    *
    * Scale: three aggregates/distincts ALL keyed on user_id, then two
    * left joins on that same key — one co-partitioned shuffle family,
    * no broadcast of anything data-sized, output = |lots|.
    */
  def lotFallback(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    // the per-record loop's lot list
    val lots = e.select(col("user_id")).distinct()
    // primary: batch-record metadata
    val primary = e
      .filter(col("event_type") === "purchase" &&
        col("value") > fallbackValueFloor)
      .groupBy(col("user_id").as("pk"))
      .agg(Fns.dayStr(max(col("ts"))).as("p_date"),
        count(lit(1)).as("p_n"))
    // fallback: data-capture metadata, renamed into the primary schema
    val fallback = e
      .filter(col("event_type") === "view" &&
        col("value") > fallbackValueFloor)
      .groupBy(col("user_id").as("fk"))
      .agg(Fns.dayStr(max(col("ts"))).as("f_date"),
        count(lit(1)).as("f_n"))
    val out = lots
      .join(primary, col("user_id") === col("pk"), "left")
      .join(fallback, col("user_id") === col("fk"), "left")
      .select(
        concat(lit("LOT-"), col("user_id").cast("string")).as("lot_number"),
        when(col("pk").isNotNull, lit("primary"))
          .when(col("fk").isNotNull, lit("fallback"))
          .otherwise(lit("none")).as("meta_source"),
        when(col("pk").isNotNull,
            concat(lit("BR-"), col("user_id").cast("string")))
          .when(col("fk").isNotNull,
            concat(lit("TPL-"), col("user_id").cast("string")))
          .otherwise(lit("")).as("product_name"),
        coalesce(col("p_date"), col("f_date"), lit("")).as("record_date"),
        coalesce(col("p_n"), col("f_n"), lit(0L)).as("n_records"),
        when(col("pk").isNull && col("fk").isNull, lit("Fail"))
          .otherwise(lit("Success")).as("status"),
        when(col("pk").isNull && col("fk").isNull,
            lit("Both api_1 calls returned empty"))
          .otherwise(lit("")).as("message"))
    canon(out)
  }

  val lotFallbackSql: String =
    s"""WITH lots AS (
       |  SELECT DISTINCT user_id FROM events
       |), p AS (
       |  SELECT user_id, strftime(max(ts), '%Y-%m-%d') AS p_date,
       |    count(*) AS p_n
       |  FROM events
       |  WHERE event_type = 'purchase' AND value > $fallbackValueFloor
       |  GROUP BY 1
       |), f AS (
       |  SELECT user_id, strftime(max(ts), '%Y-%m-%d') AS f_date,
       |    count(*) AS f_n
       |  FROM events
       |  WHERE event_type = 'view' AND value > $fallbackValueFloor
       |  GROUP BY 1
       |)
       |SELECT 'LOT-' || CAST(l.user_id AS VARCHAR) AS lot_number,
       |  CASE WHEN p.user_id IS NOT NULL THEN 'primary'
       |       WHEN f.user_id IS NOT NULL THEN 'fallback'
       |       ELSE 'none' END AS meta_source,
       |  CASE WHEN p.user_id IS NOT NULL
       |         THEN 'BR-' || CAST(l.user_id AS VARCHAR)
       |       WHEN f.user_id IS NOT NULL
       |         THEN 'TPL-' || CAST(l.user_id AS VARCHAR)
       |       ELSE '' END AS product_name,
       |  coalesce(p_date, f_date, '') AS record_date,
       |  CAST(coalesce(p_n, f_n, 0) AS BIGINT) AS n_records,
       |  CASE WHEN p.user_id IS NULL AND f.user_id IS NULL
       |       THEN 'Fail' ELSE 'Success' END AS status,
       |  CASE WHEN p.user_id IS NULL AND f.user_id IS NULL
       |       THEN 'Both api_1 calls returned empty' ELSE '' END AS message
       |FROM lots l
       |LEFT JOIN p ON l.user_id = p.user_id
       |LEFT JOIN f ON l.user_id = f.user_id
       |${canonOrderSql(Seq("lot_number", "meta_source", "product_name",
         "record_date", "n_records", "status", "message"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lot_pipeline" -> lotPipeline,
    "lot_fallback" -> lotFallback)

  val oracles: Map[String, String] = Map(
    "lot_pipeline" -> lotPipelineSql,
    "lot_fallback" -> lotFallbackSql)
}
