package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A queryable METADATA table — `SELECT * FROM graft.t.history` /
  * `.files` / `.detail` — the Iceberg/Delta metadata-table surface
  * next to the DESCRIBE commands: the same frames, but as real
  * relations you can JOIN, filter, and aggregate (find the versions
  * holding >N files, join file sizes against history timestamps…).
  *
  * The content is driver-computed at scan time (metadata is
  * root-listing-sized, never data-sized) and served through DSv2
  * [[LocalScan]] — the planner turns it into a LocalTableScan, no
  * executors touched. */
class GraftMetaTable(fullName: String, df: () => DataFrame)
    extends Table with SupportsRead {

  override def name(): String = fullName
  override lazy val schema: StructType = df().schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = () =>
    new LocalScan {
      private val frame = df()
      override val readSchema: StructType = frame.schema
      override def rows(): Array[InternalRow] =
        frame.queryExecution.executedPlan.executeCollect()
      override def description(): String = s"GraftMetaScan($fullName)"
    }
}

object GraftMetaTable {
  /** The recognized metadata leaf names under a table identifier. */
  val Names: Set[String] = Set("history", "files", "detail")

  def apply(catalogAndTable: String, root: String, flavor: String,
      leaf: String): GraftMetaTable = {
    def s: SparkSession = SparkSession.active
    val fn = s"$catalogAndTable.$leaf"
    leaf match {
      case "history" =>
        new GraftMetaTable(fn,
          () => graft.operators.Snapshots.history(s, root))
      case "files" =>
        new GraftMetaTable(fn, () => graft.operators.Snapshots
          .filesFrame(s, root, flavor == "snapshot"))
      case "detail" =>
        new GraftMetaTable(fn,
          () => graft.operators.Snapshots.detail(s, root))
      case other => sys.error(s"unknown metadata table: $other")
    }
  }
}
