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
class GraftDualScanBuilder(batch: ScanBuilder, stream: () => Scan,
    wrap: Scan => Scan = identity)
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

  override def build(): Scan = new GraftDualScan(wrap(batch.build()), stream)
}

/** Runtime (DPP) filtering for the PARTITIONED catalog scan — the
  * seam Iceberg implements on its own DSv2 scan: Spark's planner only
  * injects dynamic-partition-pruning subqueries into a V2 scan that
  * declares [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]
  * (the built-in ParquetScan never does — V1 file relations get DPP
  * through a different rule). At execution, BatchScanExec hands the
  * dim-side values as filters; this wrapper folds them into the
  * ParquetScan's `partitionFilters` (name-bound by the file index)
  * and re-plans — the fact side then LISTS only the surviving
  * partitions' files, the whole point of a date-partitioned 100 TB
  * table behind a dimension join. */
class GraftRuntimePartScan(
    initial: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    partSchema: StructType)
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with SupportsReportStatistics {

  @volatile private var current = initial

  override def readSchema(): StructType = current.readSchema()
  override def description(): String = current.description()
  override def toBatch: Batch = current.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    current.columnarSupportMode()
  override def supportedCustomMetrics(): Array[CustomMetric] =
    current.supportedCustomMetrics()
  override def estimateStatistics(): Statistics =
    current.estimateStatistics()

  override def filterAttributes(): Array[NamedReference] =
    partSchema.fieldNames.map(n =>
      org.apache.spark.sql.connector.expressions.Expressions.column(n))

  override def filter(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.{sources => sf}
    def attr(name: String): Option[ce.AttributeReference] =
      partSchema.fields.find(_.name.equalsIgnoreCase(name)).map(f =>
        ce.AttributeReference(f.name, f.dataType, nullable = true)())
    def lit(name: String, v: Any): Option[ce.Literal] =
      partSchema.fields.find(_.name.equalsIgnoreCase(name)).map(f =>
        ce.Literal.create(v, f.dataType))
    // the DPP shapes: IN over the dim side's values, plus the
    // equality/null guards the planner folds in; anything else is
    // skipped (runtime filters are an optimization, never semantics)
    def toExpr(f: sf.Filter): Option[Expression] = f match {
      case sf.In(a, vs) =>
        for (ar <- attr(a); ls <- Some(vs.toIndexedSeq.flatMap(v =>
            lit(a, v))) if ls.length == vs.length)
          yield ce.In(ar, ls)
      case sf.EqualTo(a, v) =>
        for (ar <- attr(a); l <- lit(a, v)) yield ce.EqualTo(ar, l)
      case sf.IsNotNull(a) => attr(a).map(ce.IsNotNull)
      case sf.And(l, r) =>
        for (le <- toExpr(l); re <- toExpr(r)) yield ce.And(le, re)
      case sf.Or(l, r) =>
        for (le <- toExpr(l); re <- toExpr(r)) yield ce.Or(le, re)
      case _ => None
    }
    val exprs = filters.toSeq.flatMap(f => toExpr(f))
    if (exprs.nonEmpty)
      current = current.copy(
        partitionFilters = current.partitionFilters ++ exprs)
  }
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
