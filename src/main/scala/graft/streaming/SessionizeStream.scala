package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.functions._

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * the custom-state capability (KeyValueGroupedDataset) from the builder
  * mandate. Semantics match operators.Sessionize (12 h inactivity gap);
  * SessionizeStreamSpec asserts agreement on a shared input.
  *
  * State per user = the open session only (bounded); sessions close
  * either when a new event arrives past the gap, or when the event-time
  * watermark passes the gap deadline (EventTimeTimeout), so state never
  * grows with history length.
  */
object SessionizeStream {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  val gapMs: Long = 12L * 3600 * 1000

  private def closeOut(uid: Long, s: OpenSession): SessionOut =
    SessionOut(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)

  def update(uid: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(closeOut(uid, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.end > gapMs =>
          closed += closeOut(uid, s)
          open = Some(OpenSession(t, t, 1, e.value))
        case Some(s) =>
          // min(start, t): a cross-batch late event can precede the open
          // session's start (within the watermark); the merge must extend
          // the session backwards, not silently keep the stale start
          open = Some(OpenSession(math.min(s.start, t), math.max(s.end, t),
            s.n + 1, s.total + e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // EventTimeTimeout requires a timestamp strictly beyond the current
      // watermark. Spark's FlatMapGroupsWithStateExec filters input rows
      // below the watermark before this function runs (pinned by the
      // late-event spec), so admitted events satisfy end+gap > watermark —
      // the clamp is defense-in-depth for runners without that filter,
      // where an ancient event would otherwise throw and kill the query
      state.setTimeoutTimestamp(
        math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.result().iterator
  }

  /** File-source runner: watch `sourceDir` for event parquet, emit closed
    * sessions to `outDir`.
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(IncrementalPipeline.eventSchema)
      .parquet(sourceDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("value"))
      .as[Ev]
    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
    sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Batch reference with identical semantics, for the equivalence spec:
    * run the same per-group logic over a static Dataset.
    */
  def sessionsBatch(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
      val out = Seq.newBuilder[SessionOut]
      var open: Option[OpenSession] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.end > gapMs =>
            out += closeOut(uid, s)
            open = Some(OpenSession(t, t, 1, e.value))
          case Some(s) =>
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1,
              s.total + e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach(s => out += closeOut(uid, s))
      out.result().iterator
    }
  }
}
