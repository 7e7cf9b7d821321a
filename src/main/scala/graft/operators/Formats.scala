package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{canon, canonOrderSql, load}

/** Source-format breadth: the engine's operators are format-agnostic
  * DataFrames, so the same data must survive a round-trip through each
  * container format and aggregate identically. Each query writes the
  * table ONCE per (process, dataset) into the alternate format, reads it
  * back, and rolls up — the oracle computes the same rollup from the
  * parquet truth, so any write/read fidelity loss (types, nulls,
  * encoding) hash-mismatches. CSV is covered by LotSink; this module
  * adds columnar ORC and row-wise JSON-lines.
  */
object Formats {

  /** ORC round-trip: documents → ORC → rollup per source. Write-once
    * lifecycle (isolation, atomicity, cleanup) comes from TmpData.
    */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val t = TmpData.tag(sfDir)
    val path = TmpData.path("fmt_orc", t)
    TmpData.once(s"orc:$t") {
      load(spark, sfDir, "documents").write.mode("overwrite").orc(path)
    }
    val d = spark.read.orc(path)
    canon(d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id")))
  }

  val orcRoundtripSql: String =
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM documents GROUP BY 1
       |${canonOrderSql(Seq("source", "n_docs", "total_chars", "min_id", "max_id"))}""".stripMargin

  /** JSON-lines round-trip: events (sans timestamp — covered elsewhere;
    * JSON timestamp rendering is format-config, not engine semantics) →
    * JSON → rollup per event_type. Doubles survive exactly: Spark's
    * shortest-representation rendering round-trips, and the aggregate
    * uses the usual exact-decimal discipline anyway.
    */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val t = TmpData.tag(sfDir)
    val path = TmpData.path("fmt_json", t)
    TmpData.once(s"json:$t") {
      load(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").json(path)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val e = spark.read.schema(schema).json(path)
    canon(e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(14,2)")).cast("double")
          .as("total_value")))
  }

  val jsonRoundtripSql: String =
    s"""SELECT event_type, count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM events GROUP BY 1
       |${canonOrderSql(Seq("event_type", "n_events", "n_users", "total_value"))}""".stripMargin

  /** CSV round-trip — the reference's PRIMARY storage format
    * (bulk_fetch.py:90-91 writes every fetched table as CSV). Quoting
    * fidelity is the point: a derived column embeds the delimiter, the
    * quote char, and a newline, so any write/read escaping loss
    * hash-mismatches against the oracle's parquet-truth computation of
    * the same column. Read uses multiLine (embedded newlines span
    * physical lines) and an explicit schema (CSV carries no types).
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val t = TmpData.tag(sfDir)
    val path = TmpData.path("fmt_csv", t)
    val tricky = concat(lit("v,\""), substring(col("text"), 1, 17),
      lit("\"\nend"))
    TmpData.once(s"csv:$t") {
      load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"), tricky.as("tricky"))
        .write.mode("overwrite").option("header", "true").csv(path)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("tricky", StringType)))
    val d = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").csv(path)
    // order-free exact content digest: per-row 32-bit md5 prefix, summed
    canon(d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("tricky"))).as("total_chars"),
        sum(expr("cast(conv(substr(md5(tricky), 1, 8), 16, 10) AS BIGINT)"))
          .as("content_sum")))
  }

  val csvRoundtripSql: String =
    s"""WITH t AS (
       |  SELECT source,
       |    'v,"' || substr(text, 1, 17) || '"' || chr(10) || 'end' AS tricky
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(length(tricky)) AS BIGINT) AS total_chars,
       |  CAST(sum(('0x' || substr(md5(tricky), 1, 8))::BIGINT) AS BIGINT)
       |    AS content_sum
       |FROM t GROUP BY 1
       |${canonOrderSql(Seq("source", "n_docs", "total_chars", "content_sum"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orc_roundtrip" -> orcRoundtrip,
    "json_roundtrip" -> jsonRoundtrip,
    "csv_roundtrip" -> csvRoundtrip)

  val oracles: Map[String, String] = Map(
    "orc_roundtrip" -> orcRoundtripSql,
    "json_roundtrip" -> jsonRoundtripSql,
    "csv_roundtrip" -> csvRoundtripSql)
}
