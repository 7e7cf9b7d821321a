package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function layer — every reference scalar op re-expressed as
  * built-in (codegen'd) Spark expressions; zero UDFs needed for parity
  * (SURVEY.md §2.7/§2.9).
  */
object Fns {

  /** F1 (reference utils.py:11-32 `reformat_datetime`): UTC timestamp →
    * America/New_York wall time, formatted "M/d/yyyy H:mm" with no
    * leading zeros. DST-correct (EST/EDT) via the IANA tz database.
    * DuckDB oracle equivalent (session-tz independent):
    * `strftime(timezone('America/New_York', timezone('UTC', ts)), '%-m/%-d/%Y %-H:%M')`.
    */
  def reformatEastern(ts: Column): Column =
    date_format(from_utc_timestamp(ts, "America/New_York"), "M/d/yyyy H:mm")

  /** F5 (data_processor.py:71-74): null iteration number → sentinel -99999. */
  def sentinelInt(c: Column, sentinel: Int = -99999): Column =
    coalesce(c.cast("int"), lit(sentinel))

  /** F4 (data_processor.py:76-80): conditional label concat —
    * append " - <iteration>" unless label is '0' or iteration is sentinel.
    */
  def labelWithIteration(label: Column, iter: Column): Column =
    when(label =!= "0" && iter =!= -99999,
      concat(label, lit(" - "), iter.cast("string"))).otherwise(label)

  /** F6 (file_processor.py:13-17): md5 change-detection key over pipe-joined
    * columns. Callers must canonicalize numeric columns to fixed-scale
    * decimal strings first so the digest is engine-independent
    * (Java vs C double-to-string formatting differs).
    * `concat_ws` skips nulls — same as DuckDB's concat_ws.
    */
  def changeKey(cols: Column*): Column = md5(concat_ws("|", cols: _*))

  /** Canonical fixed-scale string form of a numeric column, for hashing. */
  def canonNum(c: Column, scale: Int = 2): Column =
    c.cast(s"decimal(18,$scale)").cast("string")

  /** Canonical string form of a timestamp for oracle-compared output.
    * Raw timestamp columns are never emitted: the test parquet mixes
    * ms/ns units that Spark reads as µs, so a raw round-trip can change
    * physical representation. DuckDB mirror: strftime(ts, '%Y-%m-%d %H:%M:%S.%f').
    */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Day-grain string, DuckDB mirror: strftime(ts, '%Y-%m-%d'). */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
