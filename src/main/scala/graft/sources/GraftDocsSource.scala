package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for raw document directories:
  * `spark.read.format("graftdocs").load(dir)` →
  * (source string, text string, n_chars long).
  *
  * The full modern source surface in miniature — TableProvider →
  * Table → ScanBuilder (with column pruning) → Batch → per-file
  * InputPartitions → PartitionReader. File listing happens once on
  * the driver; content is read inside the partition reader on the
  * executor, and pruned columns (e.g. `text` when only n_chars is
  * selected) are never materialized. This is the DSv2 form of the
  * reference's file-loader registry (conversadocs/bones.py:47-64) —
  * at 100 TB the same shape lists a manifest and fans out millions
  * of documents across executors.
  */
class GraftDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftdocs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocsTable.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(properties.get("path"))
}

object GraftDocsTable {
  val schema: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))
}

class GraftDocsTable(path: String) extends Table with SupportsRead {
  require(path != null, "graftdocs requires a path")
  override def name(): String = s"graftdocs:$path"
  override def schema(): StructType = GraftDocsTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(path)
}

class GraftDocsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftDocsTable.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftDocsScan(path, required)
}

case class GraftDocsFilePartition(file: String) extends InputPartition

class GraftDocsScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocsScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    Files.list(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => GraftDocsFilePartition(p.toString): InputPartition)
      .toArray.sortBy(_.asInstanceOf[GraftDocsFilePartition].file)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required.fieldNames)
}

class GraftDocsReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftDocsReader(p.asInstanceOf[GraftDocsFilePartition].file, columns)
}

class GraftDocsReader(file: String, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    // read content only if text/n_chars are actually required
    lazy val text =
      new String(Files.readAllBytes(Paths.get(file)), StandardCharsets.UTF_8)
    val values = columns.map {
      case "source" => UTF8String.fromString(file)
      case "text" => UTF8String.fromString(text)
      case "n_chars" => java.lang.Long.valueOf(text.length.toLong)
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    done = true
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
