package org.apache.spark.sql

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Batch + streaming composition for one DSv2 table: BATCH planning
  * delegates wholesale to a parquet ScanBuilder (pushdown, pruning,
  * aggregate pushdown, runtime/DPP filtering, stats — all forwarded,
  * so the engine's vectorized scan path is untouched), while
  * `toMicroBatchStream` routes to a SEPARATELY built streaming scan.
  *
  * Why this shape: a catalog table resolves batch SELECTs over a
  * driver-side RESOLVED file window (delegated to Spark's parquet
  * DSv2), but a STREAMING read must follow the table's commit log
  * version by version — two different scans behind one
  * Table.newScanBuilder seam. Lives in the org.apache.spark.sql
  * package because [[SupportsPushDownCatalystFilters]] (the filter
  * seam Spark's own FileScanBuilder uses) is private[sql] — the same
  * disclosed-shim pattern as [[GraftBridge]]. */
class GraftDualScanBuilder(batch: ScanBuilder, stream: () => Scan)
    extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    batch match {
      case b: SupportsPushDownCatalystFilters => b.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters: Array[Predicate] = batch match {
    case b: SupportsPushDownCatalystFilters => b.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    batch match {
      case b: SupportsPushDownRequiredColumns =>
        b.pruneColumns(requiredSchema)
      case _ => ()
    }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    batch match {
      case b: SupportsPushDownAggregates => b.pushAggregation(aggregation)
      case _ => false
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    batch match {
      case b: SupportsPushDownAggregates =>
        b.supportCompletePushDown(aggregation)
      case _ => false
    }

  override def build(): Scan = new GraftDualScan(batch.build(), stream)
}

private class GraftDualScan(inner: Scan, stream: () => Scan)
    extends Scan with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics(): Array[CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    inner.reportDriverMetrics()

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def filterAttributes(): Array[NamedReference] = inner match {
    case s: SupportsRuntimeV2Filtering => s.filterAttributes()
    case _ => Array.empty
  }

  override def filter(predicates: Array[Predicate]): Unit = inner match {
    case s: SupportsRuntimeV2Filtering => s.filter(predicates)
    case _ => ()
  }

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    stream().toMicroBatchStream(checkpointLocation)
}
