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

  /** events.ts has shipped in more than one physical parquet encoding
    * across dataset generations:
    *   - TIMESTAMP(MICROS) logical type (current pyarrow writers) —
    *     Spark maps it to TimestampType (or TimestampNTZType when the
    *     footer says isAdjustedToUTC=false and NTZ inference is on);
    *   - TIMESTAMP(NANOS) logical type (older writers) — Spark 4
    *     refuses to map it (PARQUET_TYPE_ILLEGAL), so it must be read
    *     as raw INT64 via an explicit schema and divided down to µs;
    *   - plain INT64 epoch-nanoseconds with no logical type (test
    *     fixtures and legacy copies).
    * An engine must read the bytes actually on disk, so `loadEvents`
    * inspects the inferred schema and picks the matching decode instead
    * of assuming one encoding. No session-wide legacy flag is mutated —
    * that would change how OTHER nanos parquet reads behave in the same
    * session. All decode paths land on µs-precision TimestampType
    * (sub-µs digits are zero in this data), and absent optional columns
    * are padded with typed nulls so the surface is stable across
    * generations.
    */
  private[graft] val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The stable events surface: eventsRawSchema's columns with ts as a
    * decoded TimestampType.
    */
  private[graft] val eventsSchema = StructType(eventsRawSchema.map(f =>
    if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")

  private[graft] def loadEvents(spark: SparkSession, path: String): DataFrame = {
    // Retire lot_pipeline's +0.2 s NTZ→TZ cast constant (r9, VERDICT r8
    // item 7): with NTZ inference off, a MICROS footer with
    // isAdjustedToUTC=false maps straight to TimestampType — the same
    // instants the cast produced under the pinned-UTC session, with NO
    // cast expression in the plan. There is no per-read knob (the
    // parquet datasource option `inferTimestampNTZ` is ignored for
    // plain reads — probed on 4.1.2), so the session conf is flipped
    // ONLY around the eager schema-inference call and restored in a
    // finally: the DataFrame's schema is fixed at creation, execution
    // never re-consults the flag. The restore is what keeps OTHER
    // nanos/NTZ parquet reads in the session on their own behavior;
    // the one caveat is a concurrent reader thread racing this window
    // — the driver contract (Verify/Bench) is single-threaded per
    // query, and a racer would only get the pre-3.4 mapping, never
    // wrong instants under a UTC session.
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val ntzPrev = spark.conf.getOption(ntzKey)
    val decoded =
      try {
        val df =
          try {
            spark.conf.set(ntzKey, "false")
            spark.read.parquet(path)
          } finally {
            ntzPrev match {
              case Some(v) => spark.conf.set(ntzKey, v)
              case None => spark.conf.unset(ntzKey)
            }
          }
        df.schema("ts").dataType match {
          case TimestampType => df
          // naive wall-clock micros; session tz is pinned to UTC by every
          // entry point, so this cast is instant-preserving. Unreachable
          // while the option above is honored — kept as the fallback
          // decode if a future reader ignores it.
          case TimestampNTZType =>
            df.withColumn("ts", col("ts").cast(TimestampType))
          case LongType => // epoch-nanoseconds stored as plain INT64
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case other => throw new IllegalStateException(
            s"events.ts: unsupported on-disk type $other at $path")
        }
      } catch {
        // TIMESTAMP(NANOS) logical type: Spark cannot map it, so re-read
        // the physical INT64 directly. Only the footer-conversion error is
        // caught; anything else (missing path, corrupt file) propagates.
        case e: Exception if Option(e.getMessage).exists(m =>
            m.contains("NANOS") || m.contains("Illegal Parquet type")) =>
          spark.read.schema(eventsRawSchema).parquet(path)
            .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      }
    // pad columns a fixture generation may omit (e.g. props), keep the
    // canonical column order, then append any extra columns untouched
    val present = decoded.columns.toSet
    val extras = decoded.columns.filterNot(eventsSchema.fieldNames.contains)
    val cols = eventsSchema.fields.map { f =>
      if (present.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ extras.map(col)
    decoded.select(cols.toSeq: _*)
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
