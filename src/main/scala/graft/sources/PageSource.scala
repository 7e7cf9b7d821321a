package graft.sources

import java.util
import scala.collection.JavaConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
      properties.getOrDefault("pageSize", "1000").toInt)
}

object PageSource {
  val defaultSchema: StructType = StructType(Seq(
    StructField("record_id", LongType),
    StructField("lot", StringType),
    StructField("status", StringType),
    StructField("value", DoubleType)))
}

class PageTable(tableSchema: StructType, path: String, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_pages($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(tableSchema, path, pageSize)
}

class PageScanBuilder(fullSchema: StructType, path: String, pageSize: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit = {
    // preserve full-schema field order for deterministic row layout
    val keep = required.fieldNames.toSet
    requiredSchema = StructType(fullSchema.fields.filter(f => keep(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo(attr, _) => fullSchema.fieldNames.contains(attr)
      case _ => false
    }
    pushed = supported
    rest // Spark evaluates the rest post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new PageScan(requiredSchema, path, pageSize, pushed)
}

class PageScan(schema: StructType, path: String, pageSize: Int,
    filters: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages path=$path pageSize=$pageSize pushed=${filters.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // the "server"'s total count query: one cheap pass to count records,
    // then one partition per page (mirrors the currentPage loop)
    val src = scala.io.Source.fromFile(path)
    val total = try src.getLines().size finally src.close()
    val nPages = math.max(1, (total + pageSize - 1) / pageSize)
    (0 until nPages).map(p =>
      PagePartition(path, p.toLong * pageSize, math.min((p + 1).toLong * pageSize, total))
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(schema, filters)
}

case class PagePartition(path: String, start: Long, end: Long)
    extends InputPartition

class PageReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition], schema, filters)
}

/** Reads one "page" of JSON records: lines [start, end) of the file. */
class PageReader(p: PagePartition, schema: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val source = scala.io.Source.fromFile(p.path)
  private val lines = source.getLines().slice(p.start.toInt, p.end.toInt)
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
  override def close(): Unit = source.close()
}
