package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** T8 streaming face: the reference's file_processing_history audit
  * trail (schema.py:38-51) as a StreamingQueryListener — every
  * micro-batch appends an audit line (query, batch, rows, timestamp),
  * failures and stops included, without touching the query itself.
  */
class AuditListener(logPath: String) extends StreamingQueryListener {

  private def append(line: String): Unit = synchronized {
    Files.write(Paths.get(logPath), (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  // Full control-char escaping (graft.JsonUtil): terminated-query records
  // carry exception messages with embedded newlines/stack traces, which
  // would otherwise span physical lines and corrupt the JSON-lines log.
  private def q(s: String): String = graft.JsonUtil.quote(s)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    append(s"""{"event": "started", "id": ${q(e.id.toString)}, "ts": ${q(e.timestamp)}}""")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    append(s"""{"event": "progress", "id": ${q(e.progress.id.toString)}, "batch": ${e.progress.batchId}, "rows": ${e.progress.numInputRows}, "ts": ${q(e.progress.timestamp)}}""")

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    append(s"""{"event": "terminated", "id": ${q(e.id.toString)}, "error": ${e.exception.map(q).getOrElse("null")}}""")
}
