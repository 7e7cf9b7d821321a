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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lot_pipeline" -> lotPipeline)

  val oracles: Map[String, String] = Map(
    "lot_pipeline" -> lotPipelineSql)
}
