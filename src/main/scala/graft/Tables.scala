package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loading + determinism helpers shared by every operator.
  *
  * Design notes (scale-first):
  *  - All inputs are parquet; `load` is a plain `spark.read.parquet` so
  *    Catalyst's ColumnPruning / PushDownPredicate reach the scan
  *    (`PushedFilters` / pruned `ReadSchema` in explain output).
  *  - Nothing here collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType (PARQUET_TYPE_ILLEGAL). Request the physical INT64
    * via an explicit schema (no session-wide legacy flag — mutating
    * global conf as a read side effect would change how OTHER nanos
    * parquet reads behave in the same session), then convert to a
    * µs-precision TimestampType (sub-µs digits are zero in this data).
    */
  private[graft] val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.schema(eventsRawSchema).parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Canonical deterministic output order: all columns, sorted by column
    * name, ascending (Spark default = NULLS FIRST). Every oracle SQL must
    * end with `ORDER BY <name-sorted cols> NULLS FIRST` to match.
    * The driver hash-compares row streams, so row order must agree.
    */
  def canon(df: DataFrame): DataFrame =
    df.orderBy(df.columns.sorted.map(col).toSeq: _*)

  /** The matching ORDER BY clause for an oracle SQL statement. */
  def canonOrderSql(cols: Seq[String]): String =
    cols.sorted.map(c => s"$c NULLS FIRST").mkString("ORDER BY ", ", ", "")

  /** Schema padding (reference: utils.py:35-41 `ensure_required_columns`):
    * any required column absent from the input is added as empty string,
    * then the fixed projection selects/orders them.
    */
  def ensureColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    val padded = required.filterNot(present.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit("")))
    padded.select(required.map(col).toSeq: _*)
  }

  /** Trim every string column (reference: bulk_fetch.py:154 applies
    * `.str.strip()` to all object columns). Pure codegen'd expressions.
    */
  def trimAll(df: DataFrame): DataFrame = {
    val trimmed = df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(trimmed.toSeq: _*)
  }
}
