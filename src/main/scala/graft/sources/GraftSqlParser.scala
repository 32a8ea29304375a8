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
    case VacuumRe(table, retain, dry) =>
      if (dry != null)
        GraftVacuumDryRunCommand(multipart(table),
          Option(retain).map(_.trim.toInt))
      else GraftVacuumCommand(multipart(table),
        Option(retain).map(_.trim.toInt))
    case HistoryRe(table) => GraftHistoryCommand(multipart(table))
    case DetailRe(table) => GraftDetailCommand(multipart(table))
    case RestoreVerRe(table, v) =>
      GraftRestoreCommand(multipart(table), Left(v.trim.toLong))
    case RestoreTsRe(table, ts) =>
      GraftRestoreCommand(multipart(table), Right(ts))
    case CloneRe(dst, src, v) =>
      GraftCloneCommand(multipart(dst), multipart(src),
        Option(v).map(_.trim.toLong))
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
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Tbl + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Tbl + """\s*;?\s*$""").r
  private val RestoreVerRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Tbl +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val RestoreTsRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Tbl +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private val CloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + Tbl + """\s+SHALLOW\s+CLONE\s+""" +
      Tbl + """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""").r

  /** Resolve a (possibly catalog-qualified) multipart name to its
    * graft catalog + identifier, honoring the session's current
    * catalog. */
  private[sources] def resolveCatalog(spark: SparkSession,
      parts: Seq[String]): (GraftCatalog, Identifier) = {
    val cm = spark.sessionState.catalogManager
    val (cat, ident) =
      if (parts.length >= 2 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog =>
        (g, Identifier.of(ident.init.toArray, ident.last))
      case other => sys.error(
        s"'${parts.mkString(".")}': ${other.name()} is not a graft " +
          "lake catalog — the lake maintenance statements apply to " +
          "graft.sources.GraftCatalog tables")
    }
  }

  /** Resolve to the loaded graft table. */
  private[sources] def resolve(spark: SparkSession,
      parts: Seq[String]): GraftSqlTable = {
    val (g, ident) = resolveCatalog(spark, parts)
    g.loadTable(ident) match {
      case t: GraftSqlTable => t
      case other => sys.error(s"not a graft table: $other")
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
        require(t.partCols.isEmpty,
          s"${t.name()}: ZORDER on a PARTITIONED table is not " +
            "supported — the z-curve re-lay would flatten the hive " +
            "layout; compact (plain OPTIMIZE) preserves partitions")
        (Snapshots.optimize(spark, t.root, cx, cy), s"zorder($cx,$cy)")
      case _ =>
        (Snapshots.compactLog(spark, t.root, t.partCols), "compact")
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

/** `VACUUM <t> [RETAIN n VERSIONS] DRY RUN` — what retention WOULD
  * reap right now, one row per candidate version, nothing deleted
  * (Delta's dry run): the plan comes from the SAME computation the
  * real vacuum executes (vacuumLogPlan / vacuumPlan), so the preview
  * cannot drift from the action; flavor routing and the RETAIN
  * guards surface identically. */
case class GraftVacuumDryRunCommand(parts: Seq[String],
    retain: Option[Int]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed", BooleanType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    val plan =
      if (t.flavor == "snapshot") {
        val keep = retain.getOrElse(sys.error(
          s"${t.name()}: snapshot-flavor VACUUM needs RETAIN <n> " +
            "VERSIONS (how many newest snapshots to keep)"))
        Snapshots.vacuumPlan(t.root, keep)
      } else {
        require(retain.isEmpty,
          s"${t.name()}: log-flavor retention is the reader window — " +
            "RETAIN does not apply; OPTIMIZE (compact) first to " +
            "shrink the window, then VACUUM")
        Snapshots.vacuumLogPlan(t.root)
      }
    plan.map { case (v, d) =>
      val files = graft.operators.LakeFs.leaves(d).filter(_.isFile)
      Row(v, Snapshots.isCommittedDir(d),
        files.size.toLong, files.map(_.getLen).sum)
    }
  }
}

/** `RESTORE TABLE <t> TO VERSION AS OF <v>` (or `TO TIMESTAMP AS OF
  * '<ts>'` through the commit-time resolution) — republish the state
  * at `v` as the NEW latest: snapshot flavor rewrites one snapshot,
  * log flavor folds the as-of window into a compacted base that
  * subsumes the bad tail. History stays immutable and travelable
  * below — exactly Delta's RESTORE. Keyed-MoR logs refuse inside
  * restoreLog with the restoreLogMerged hint. */
case class GraftRestoreCommand(parts: Seq[String],
    to: Either[Long, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("restored_to", LongType)(),
    AttributeReference("new_version", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(spark, parts)
    val v = to match {
      case Left(ver) => ver
      case Right(ts) =>
        // commit times are epoch millis (marker mtime); the literal
        // parses in the session's UTC discipline
        val millis = java.sql.Timestamp.valueOf(
          ts.trim.replace("T", " ")).getTime
        Snapshots.versionAtTimestamp(t.root, millis)
    }
    val nv =
      if (t.flavor == "snapshot") Snapshots.restore(spark, t.root, v)
      else Snapshots.restoreLog(spark, t.root, v, t.partCols)
    Seq(Row(t.name(), v, nv))
  }
}

/** `CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF v]` —
  * zero-copy: the clone's one version is a pointer at the source's
  * (as-of) state, reads resolve through the source's files, writes
  * diverge copy-on-write, and the source version is pinned by an
  * immutable tag so retention never dangles the clone
  * (Snapshots.cloneTable/cloneLog). The clone inherits the source's
  * flavor. */
case class GraftCloneCommand(dst: Seq[String], src: Seq[String],
    asOf: Option[Long]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("version", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val s = GraftSqlParser.resolve(spark, src)
    val (dstCat, dstIdent) = GraftSqlParser.resolveCatalog(spark, dst)
    val dstPath = dstCat.tablePath(dstIdent)
    require(!dstCat.isTable(dstPath),
      s"${dst.mkString(".")}: clone target already exists")
    graft.operators.LakeFs.mkdirs(dstPath)
    val v =
      if (s.flavor == "snapshot")
        Snapshots.cloneTable(spark, s.root, dstPath, asOf)
      else Snapshots.cloneLog(spark, s.root, dstPath, asOf)
    // carry the source's declared shape: a partitioned clone needs
    // the declared schema (partition values are not in footers), and
    // the clone inherits the source's CHECK constraints
    GraftCatalog.writeMeta(dstPath, s.flavor, Some(s.schema), s.partCols,
      s.checks)
    Seq(Row(dst.mkString("."), v))
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
