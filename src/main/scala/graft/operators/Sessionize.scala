package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** Sessionization (gaps-and-islands): split each user's event stream
  * into sessions separated by a 12-hour inactivity gap.
  *
  * Batch face: pure window functions (lag → new-session flag → running
  * sum → session number → group) — no per-group memory assumption, one
  * shuffle on user_id, scales to any per-user history length. The
  * stateful streaming face lives in streaming.SessionizeStream; its
  * spec asserts agreement with this batch result.
  *
  * Gap comparison uses epoch microseconds (exact integers) on both
  * engines — never seconds (truncation skew) or raw intervals.
  */
object Sessionize {

  val gapMicros: Long = 12L * 3600 * 1000000

  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = e
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        Fns.tsStr(min(col("ts"))).as("session_start"),
        Fns.tsStr(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
    canon(out)
  }

  val sessionizeSql: String =
    s"""WITH ordered AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapMicros
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
       |  FROM ordered
       |)
       |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM numbered GROUP BY 1, 2
       |${canonOrderSql(Seq("user_id", "session_no", "session_start",
         "session_end", "n_events", "total_value"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> sessionize)

  val oracles: Map[String, String] = Map(
    "sessionize" -> sessionizeSql)
}
