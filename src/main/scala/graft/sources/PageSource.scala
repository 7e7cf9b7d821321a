package graft.sources

import java.util
import scala.collection.JavaConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.read.SupportsPushDownLimit
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector simulating the reference's paginated REST scan
  * (api_client.py:39-73: currentPage/itemsPerPage loop over a JSON
  * envelope, with server-side query params and field selection).
  *
  * The "API" is a JSON-lines file; the connector maps the REST semantics
  * onto DSv2 contracts:
  *
  *  - pagination      → one InputPartition per page (`pageSize` option,
  *                      default 1000 = the reference's itemsPerPage)
  *  - query params    → SupportsPushDownFilters: EqualTo filters are
  *                      claimed and applied inside the reader (the
  *                      "server" filters; Spark never re-evaluates them)
  *  - field selection → SupportsPushDownRequiredColumns: only requested
  *                      fields are parsed out of each JSON record
  *
  * Usage:
  *   spark.read.format("graft.sources.PageSourceProvider")
  *     .schema(...).option("path", file).option("pageSize", "1000").load()
  *
  * At scale the same contracts drive a real HTTP reader: partitions
  * become page fetches, pushed filters become query params.
  */
class PageSourceProvider extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageSource.defaultSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PageTable(schema,
      properties.getOrDefault("path", ""),
      properties.getOrDefault("pageSize", "1000").toInt,
      RetryConf(
        properties.getOrDefault("maxRetries", "3").toInt,
        properties.getOrDefault("retryDelayMs", "200").toLong,
        properties.getOrDefault("injectFaults", "0").toInt,
        properties.getOrDefault("onExhausted", "fail")))
}

object PageSource {
  val defaultSchema: StructType = StructType(Seq(
    StructField("record_id", LongType),
    StructField("lot", StringType),
    StructField("status", StringType),
    StructField("value", DoubleType)))
}

/** S1 retry contract (reference api_client.py:23-37: up to 3 attempts,
  * fixed 0.2 s delay, give up after the last). `injectFaults` is the
  * offline fault-injection hook: each page's first N fetch attempts
  * throw, standing in for a flaky HTTP endpoint. `onExhausted` picks the
  * give-up behavior: "fail" (Spark-correct: the task fails loudly) or
  * "skip" (reference parity: the client returns None and the page loop
  * moves on — the page contributes no rows).
  */
case class RetryConf(maxRetries: Int, delayMs: Long, injectFaults: Int,
    onExhausted: String)

/** JVM-global injected-fault budgets, keyed per page — readers run in
  * executor threads (local mode shares the JVM), and the budget must
  * survive reader re-instantiation to model "same request, new attempt".
  */
object PageFaults {
  private val remaining =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def maybeFail(key: String, inject: Int): Unit =
    if (inject > 0) {
      val c = remaining.computeIfAbsent(key,
        _ => new java.util.concurrent.atomic.AtomicInteger(inject))
      if (c.getAndDecrement() > 0)
        throw new java.io.IOException(s"injected transient fault for $key")
    }

  def reset(): Unit = remaining.clear()
}

class PageTable(tableSchema: StructType, path: String, pageSize: Int,
    retry: RetryConf = RetryConf(3, 200L, 0, "fail"))
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_pages($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(tableSchema, path, pageSize, retry)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PageWriteBuilder(info.schema(), path)
}

/** Batched-append write path — the reference's JDBC `execute_values`
  * batch insert (operations.py:36-38) as a DSv2 BatchWrite: each task
  * buffers its rows into a private staging file (one "batch"), and the
  * driver-side commit appends all staged batches to the target
  * atomically-enough for the simulation (a real sink would POST each
  * batch). Aborted tasks leave only staging files, never partial target
  * writes.
  */
class PageWriteBuilder(schema: StructType, path: String) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new PageBatchWrite(schema, path)
  }
}

case class PageCommitMessage(stagedPath: String) extends WriterCommitMessage

class PageBatchWrite(schema: StructType, path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PageWriterFactory(schema, path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val out = new java.io.FileOutputStream(path, true)
    try messages.foreach { case PageCommitMessage(staged) =>
      val f = new java.io.File(staged)
      if (f.exists()) {
        java.nio.file.Files.copy(f.toPath, out)
        f.delete()
      }
    } finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case PageCommitMessage(staged) => new java.io.File(staged).delete()
      case _ => ()
    }
}

class PageWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PageDataWriter(schema, s"$path.staging-$partitionId-$taskId")
}

class PageDataWriter(schema: StructType, stagedPath: String)
    extends DataWriter[InternalRow] {
  // BufferedWriter (not PrintWriter): I/O failures must THROW so the
  // task fails and retries — PrintWriter swallows them and a truncated
  // staging batch would commit as success.
  private val writer = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(stagedPath), java.nio.charset.StandardCharsets.UTF_8))

  /** Full JSON string escaping — the format is line-oriented, so control
    * characters (esp. newlines) must be escaped or the record would span
    * physical lines and break the read path.
    */
  private def jsonEscape(s: String): String = graft.JsonUtil.escape(s)

  override def write(row: InternalRow): Unit = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + jsonEscape(row.getUTF8String(i).toString) + "\""
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case other => throw new IllegalArgumentException(
            s"graft-pages write: unsupported type $other")
        }
      "\"" + f.name + "\": " + v
    }
    writer.write(fields.mkString("{", ", ", "}"))
    writer.newLine()
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    PageCommitMessage(stagedPath)
  }

  override def abort(): Unit = {
    writer.close()
    new java.io.File(stagedPath).delete()
  }

  override def close(): Unit = writer.close()
}

class PageScanBuilder(fullSchema: StructType, path: String, pageSize: Int,
    retry: RetryConf = RetryConf(3, 200L, 0, "fail"))
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  /** Limit pushdown = the REST client's early page-loop stop: plan only
    * ceil(limit/pageSize) pages instead of scanning the whole endpoint.
    * Safe only when NO filters are pushed — a server-filtered page yields
    * fewer than pageSize rows, so page-count pruning could under-return.
    * Partial push (Spark keeps its own Limit operator above the scan).
    */
  override def pushLimit(l: Int): Boolean =
    if (pushed.isEmpty) { limit = Some(l); true } else false

  override def pruneColumns(required: StructType): Unit = {
    // preserve full-schema field order for deterministic row layout
    val keep = required.fieldNames.toSet
    requiredSchema = StructType(fullSchema.fields.filter(f => keep(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Claim ONLY string equality. A claimed filter is never re-evaluated
    // by Spark, and the reader compares JSON text — safe for strings,
    // wrong for numerics ("2" vs "2.0"). Numeric predicates stay
    // post-scan where Spark evaluates them on the parsed values.
    val (supported, rest) = filters.partition {
      case EqualTo(attr, _: String) =>
        fullSchema.fields.exists(f => f.name == attr && f.dataType == StringType)
      case _ => false
    }
    pushed = supported
    rest // Spark evaluates the rest post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new PageScan(requiredSchema, path, pageSize, pushed, limit, retry)
}

class PageScan(schema: StructType, path: String, pageSize: Int,
    filters: Array[Filter], limit: Option[Int] = None,
    retry: RetryConf = RetryConf(3, 200L, 0, "fail")) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages path=$path pageSize=$pageSize pushed=${filters.mkString(",")}" +
      limit.fold("")(l => s" limit=$l")

  override def planInputPartitions(): Array[InputPartition] = {
    // ONE planning pass records the byte offset of each page boundary,
    // so every reader seeks straight to its page — O(file) total, not
    // O(pages × file), and offsets are longs (no 2^31-line limit).
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(path), 1 << 20)
    val pageStarts = scala.collection.mutable.ArrayBuffer[Long](0L)
    var pos = 0L; var lineInPage = 0; var b = in.read()
    try {
      while (b != -1) {
        pos += 1
        if (b == '\n') {
          lineInPage += 1
          if (lineInPage == pageSize) { pageStarts += pos; lineInPage = 0 }
        }
        b = in.read()
      }
    } finally in.close()
    val fileEnd = pos
    // drop a trailing boundary that coincides with EOF (no empty page)
    val allStarts = if (pageStarts.last >= fileEnd && pageStarts.length > 1)
      pageStarts.dropRight(1) else pageStarts
    // pushed limit: fetch only the pages needed to satisfy it (each
    // unfiltered page contributes exactly pageSize rows, last may be short)
    val starts = limit.fold(allStarts) { l =>
      allStarts.take(math.max(1, ((l + pageSize - 1) / pageSize)))
    }
    starts.indices.map { i =>
      val end = if (i + 1 < starts.length) starts(i + 1)
        else if (starts.length < allStarts.length) allStarts(starts.length)
        else fileEnd
      PagePartition(path, starts(i), end).asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(schema, filters, retry)
}

case class PagePartition(path: String, start: Long, end: Long)
    extends InputPartition

class PageReaderFactory(schema: StructType, filters: Array[Filter],
    retry: RetryConf = RetryConf(3, 200L, 0, "fail"))
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition], schema, filters, retry)
}

/** Reads one "page" of JSON records: byte range [start, end) of the
  * file — seeks directly to its page, reads only its own bytes. The page
  * open (= the HTTP request in the REST analog) runs under the S1 retry
  * contract: up to `maxRetries` attempts with a fixed delay, then either
  * fail the task or yield an empty page (RetryConf.onExhausted).
  */
class PageReader(p: PagePartition, schema: StructType, filters: Array[Filter],
    retry: RetryConf = RetryConf(3, 200L, 0, "fail"))
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var channel: java.io.RandomAccessFile = _
  private var reader: java.io.BufferedReader = _

  private def openPage(): Iterator[String] = {
    PageFaults.maybeFail(s"${p.path}#${p.start}", retry.injectFaults)
    channel = new java.io.RandomAccessFile(p.path, "r")
    channel.seek(p.start)
    reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(
        new java.io.InputStream {
          private var remaining = p.end - p.start
          override def read(): Int =
            if (remaining <= 0) -1
            else { remaining -= 1; channel.read() }
          override def read(buf: Array[Byte], off: Int, len: Int): Int = {
            if (remaining <= 0) return -1
            val n = channel.read(buf, off, math.min(len.toLong, remaining).toInt)
            if (n > 0) remaining -= n
            n
          }
        }, java.nio.charset.StandardCharsets.UTF_8))
    Iterator.continually(reader.readLine())
      .takeWhile(_ != null).filter(_.nonEmpty)
  }

  // api_client.py:23-37: N attempts with a fixed inter-attempt delay;
  // on exhaustion either propagate (task fails, Spark-correct) or give
  // up quietly like the reference's `return None` (empty page). Only
  // IOException is retried — interrupts (task kill) and programming
  // errors propagate immediately instead of being slept on or, worse,
  // silently converted into an empty page under onExhausted=skip.
  private val lines: Iterator[String] = {
    var result: Iterator[String] = null
    var attempt = 0
    while (result == null) {
      attempt += 1
      try result = openPage()
      catch {
        case e: java.io.IOException =>
          if (channel != null) { channel.close(); channel = null }
          if (attempt < retry.maxRetries) Thread.sleep(retry.delayMs)
          else if (retry.onExhausted == "skip") result = Iterator.empty
          else throw e
      }
    }
    result
  }

  private var current: InternalRow = _

  private def matches(node: JsonNode): Boolean = filters.forall {
    case EqualTo(attr, v) =>
      val field = node.get(attr)
      field != null && field.asText() == v.toString
    case _ => true
  }

  private def toRow(node: JsonNode): InternalRow = {
    val values = schema.fields.map { f =>
      val n = node.get(f.name)
      if (n == null || n.isNull) null
      else f.dataType match {
        case LongType => java.lang.Long.valueOf(n.asLong())
        case IntegerType => java.lang.Integer.valueOf(n.asInt())
        case DoubleType => java.lang.Double.valueOf(n.asDouble())
        case StringType => UTF8String.fromString(n.asText())
        case other => throw new IllegalArgumentException(
          s"graft-pages: unsupported type $other for field ${f.name}")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      if (matches(node)) { current = toRow(node); return true }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = {
    if (reader != null) reader.close()
    if (channel != null) channel.close()
  }
}
