package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `spark.read.format("graft.sources.WarcDataSource")` — a DataSourceV2 scan
 * over WARC files (S1/S2 in SURVEY §2.1), replacing the reference's
 * single-threaded ReadRecord pull loop (/root/reference/read.go:205-344)
 * with one Spark input partition per file (a 100 TB crawl archive is many
 * ~1 GB files — the reference's own rotation default, utils.go:184-186 —
 * so file granularity IS the split granularity; finer member-level splits
 * would use the per-record gzip-member index the writer lays down).
 *
 * Scan-level optimizations implemented natively:
 *  - column pruning (SupportsPushDownRequiredColumns): the ReadOpts
 *    "no content" scan (read.go:210-215) generalized — unneeded columns are
 *    never materialized into rows (content bytes are still consumed from the
 *    stream, as in the reference's discardN, read.go:183-198)
 *  - filter pushdown (SupportsPushDownFilters) on warc_type / target_uri
 *    equality and IN — the ShouldSkipRecord filter (cmd/warc/utils/utils.go:43-57)
 *    evaluated record-side before row materialization
 */
class WarcDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object WarcTable {
  val Schema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_length", LongType),
    StructField("block_digest", StringType),
    StructField("payload_digest", StringType),
    StructField("concurrent_to", StringType),
    StructField("refers_to", StringType),
    StructField("profile", StringType),
    StructField("truncated", StringType),
    StructField("version", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("content", BinaryType),
    StructField("source_file", StringType),
    StructField("record_ordinal", LongType)))

  /** header key feeding each top-level promoted column (SURVEY §1.5). */
  val HeaderOf: Map[String, String] = Map(
    "record_id" -> "warc-record-id", "warc_type" -> "warc-type",
    "target_uri" -> "warc-target-uri", "warc_date" -> "warc-date",
    "block_digest" -> "warc-block-digest", "payload_digest" -> "warc-payload-digest",
    "concurrent_to" -> "warc-concurrent-to", "refers_to" -> "warc-refers-to",
    "profile" -> "warc-profile", "truncated" -> "warc-truncated")
}

class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warc($path)"
  override def schema(): StructType = WarcTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(if (path != null) path else options.get("path"))
}

class WarcScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo(a, _) => WarcScan.FilterableCols.contains(a)
      case In(a, _) => WarcScan.FilterableCols.contains(a)
      case _ => false
    }
    pushed = supported
    rest // Spark re-evaluates the rest (and may re-check ours — harmless)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(path, required, pushed)
}

object WarcScan {
  val FilterableCols: Set[String] = Set("warc_type", "target_uri", "record_id")
}

class WarcScan(path: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=$path, columns=${required.fieldNames.mkString(",")}, " +
      s"pushed=[${filters.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.map(_.toString)
          .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz")).toSeq.sorted
      else Seq(path)
    files.map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters)
}

case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].file, required, filters)
}

class WarcPartitionReader(file: String, required: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val stream = Files.newInputStream(Paths.get(file))
  private val it = WarcIO.records(stream)
  private var current: WarcIO.ParsedRecord = _

  private def fieldValue(rec: WarcIO.ParsedRecord, name: String): Any = name match {
    case "content_length" => rec.headers.get("content-length").map(_.toLong).orNull
    case "version" => UTF8String.fromString(rec.version)
    case "content" => rec.content
    case "source_file" => UTF8String.fromString(file)
    case "record_ordinal" => rec.offset
    case "headers" =>
      ArrayBasedMapData(rec.headers,
        (k: Any) => UTF8String.fromString(k.asInstanceOf[String]),
        (v: Any) => UTF8String.fromString(v.asInstanceOf[String]))
    case promoted =>
      WarcTable.HeaderOf.get(promoted)
        .flatMap(rec.headers.get)
        .map(UTF8String.fromString)
        .orNull
  }

  private def strField(rec: WarcIO.ParsedRecord, name: String): String =
    WarcTable.HeaderOf.get(name).flatMap(rec.headers.get).orNull

  private def passes(rec: WarcIO.ParsedRecord): Boolean = filters.forall {
    case EqualTo(a, v) => strField(rec, a) == v
    case In(a, vs) => vs.contains(strField(rec, a))
    case _ => true
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val r = it.next()
      if (passes(r)) { current = r; return true }
    }
    false
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(required.fields.map(f => fieldValue(current, f.name)).toSeq)

  override def close(): Unit = stream.close()
}
