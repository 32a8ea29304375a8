package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType, StringType, StructType}

import graft.operators.Snapshots

/** The lake's MAINTENANCE SQL — the statements Delta ships through
  * its own delegating parser, over graft catalog tables:
  *
  *   OPTIMIZE lake.t                      -- collapse the log window (compactLog)
  *   OPTIMIZE lake.t ZORDER BY (cx, cy)   -- fold + z-order + stats manifest
  *   VACUUM lake.t                        -- log flavor: reap below the reader window
  *   VACUUM lake.t RETAIN 3 VERSIONS      -- snapshot flavor: keep newest 3
  *   DESCRIBE HISTORY lake.t              -- per-version commit log
  *   DESCRIBE DETAIL lake.t               -- one-row table summary
  *
  * None of these exist in Spark's grammar, so a delegating
  * [[ParserInterface]] recognizes exactly these four shapes and hands
  * EVERYTHING else (including every standard DESCRIBE) to Spark's
  * parser untouched — the same seam Delta's DeltaSqlParser uses.
  * Each statement maps 1:1 onto the programmatic API (compactLog /
  * optimize / vacuumLog / vacuum / history / detail), so SQL and
  * engine jobs stay interchangeable on the same roots; the guards
  * those APIs enforce (keyed-MoR logs route to optimizeMerged,
  * append-log roots refuse snapshot vacuum, pins never reap) surface
  * through SQL unchanged. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(table, zcols) =>
      val z = Option(zcols).map(_.split(",").map(stripQuotes).toSeq)
      z.foreach(cs => require(cs.size == 2,
        s"OPTIMIZE … ZORDER BY takes exactly 2 columns (the 2-D " +
          s"z-curve), got ${cs.size}"))
      GraftOptimizeCommand(multipart(table), z)
    case VacuumRe(table, retain) =>
      GraftVacuumCommand(multipart(table),
        Option(retain).map(_.trim.toInt))
    case HistoryRe(table) => GraftHistoryCommand(multipart(table))
    case DetailRe(table) => GraftDetailCommand(multipart(table))
    case _ => delegate.parsePlan(sqlText)
  }

  private def multipart(raw: String): Seq[String] =
    delegate.parseMultipartIdentifier(raw.trim)

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1)
    else t
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // identifier part: word chars / dots between parts / backticked
  // segments; the catalog's own segment grammar re-validates on load
  private val Tbl = """((?:`[^`]+`|[\w.-])+)"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Tbl +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Tbl +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Tbl + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Tbl + """\s*;?\s*$""").r

  /** Resolve a (possibly catalog-qualified) multipart name to its
    * graft catalog table, honoring the session's current catalog. */
  private[sources] def resolve(spark: SparkSession,
      parts: Seq[String]): GraftSqlTable = {
    val cm = spark.sessionState.catalogManager
    val (cat, ident) =
      if (parts.length >= 2 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog =>
        g.loadTable(Identifier.of(ident.init.toArray, ident.last)) match {
          case t: GraftSqlTable => t
          case other => sys.error(s"not a graft table: $other")
        }
      case other => sys.error(
        s"'${parts.mkString(".")}': ${other.name()} is not a graft " +
          "lake catalog — OPTIMIZE/VACUUM/DESCRIBE HISTORY/DETAIL " +
          "apply to graft.sources.GraftCatalog tables")
    }
  }
}

/** `OPTIMIZE <t>` = collapse the reader window into one base
  * (compactLog — O(window), the terminal fold); with `ZORDER BY
  * (cx, cy)` = the same fold laid out on the 2-D z-curve with a
  * min/max stats manifest (Snapshots.optimize), so point/range reads
  * after it prune files. Log flavor only — a snapshot-flavor table
  * IS one version; there is no window to fold. */
case class GraftOptimizeCommand(parts: Seq[String],
    zorder: Option[Seq[String]]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("version", LongType)(),
    AttributeReference("action", StringType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    require(t.flavor != "snapshot",
      s"${t.name()}: OPTIMIZE applies to log-flavor tables (a " +
        "snapshot-flavor table is one version — publish a clustered " +
        "state instead)")
    val (v, action) = zorder match {
      case Some(Seq(cx, cy)) =>
        (Snapshots.optimize(spark, t.root, cx, cy), s"zorder($cx,$cy)")
      case _ => (Snapshots.compactLog(spark, t.root), "compact")
    }
    Seq(Row(t.name(), v, action))
  }
}

/** `VACUUM <t>` — retention. Log flavor reaps every version below
  * the current reader window (and below each pin's window), exactly
  * vacuumLog; `RETAIN n VERSIONS` refuses there — the window IS the
  * retention unit (compact first to shrink it). Snapshot flavor
  * requires RETAIN and keeps the newest n committed snapshots. */
case class GraftVacuumCommand(parts: Seq[String], retain: Option[Int])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("action", StringType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    val action =
      if (t.flavor == "snapshot") {
        val keep = retain.getOrElse(sys.error(
          s"${t.name()}: snapshot-flavor VACUUM needs RETAIN <n> " +
            "VERSIONS (how many newest snapshots to keep)"))
        Snapshots.vacuum(t.root, keep)
        s"kept newest $keep snapshots"
      } else {
        require(retain.isEmpty,
          s"${t.name()}: log-flavor retention is the reader window — " +
            "RETAIN does not apply; OPTIMIZE (compact) first to " +
            "shrink the window, then VACUUM")
        Snapshots.vacuumLog(t.root)
        "reaped below the reader window"
      }
    Seq(Row(t.name(), action))
  }
}

/** `DESCRIBE HISTORY <t>` — the per-version commit log
  * (Snapshots.history): version, commit state, fold/tombstone/stats
  * markers, commit timestamp, tags, clone bit. */
case class GraftHistoryCommand(parts: Seq[String])
    extends LeafRunnableCommand {

  // mirrors Snapshots.history's frame shape; HistorySqlSpec pins the
  // two schemas equal so drift fails loudly
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed", BooleanType, nullable = false)(),
    AttributeReference("compacted_base", BooleanType, nullable = false)(),
    AttributeReference("tombstone", BooleanType, nullable = false)(),
    AttributeReference("has_stats", BooleanType, nullable = false)(),
    AttributeReference("committed_at_ms", LongType)(),
    AttributeReference("base_from", LongType)(),
    AttributeReference("tags", ArrayType(StringType))(),
    AttributeReference("shallow_clone", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    Snapshots.history(spark, t.root).collect().toSeq
  }
}

/** `DESCRIBE DETAIL <t>` — the one-row table summary
  * (Snapshots.detail): window + latest read costs, version/pin
  * counts, MoR flags. */
case class GraftDetailCommand(parts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    "latest_version", "n_committed", "n_torn", "window_versions",
    "n_data_files", "size_bytes", "latest_data_files",
    "latest_size_bytes", "n_tags", "n_branches").map(n =>
    AttributeReference(n, LongType, nullable = false)()) ++ Seq(
    AttributeReference("has_tombstones", BooleanType, nullable = false)(),
    AttributeReference("n_clone_versions", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    Snapshots.detail(spark, t.root).collect().toSeq
  }
}
