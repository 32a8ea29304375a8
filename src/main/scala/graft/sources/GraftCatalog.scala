package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column => V2Column, Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{LakeFs, Snapshots}

/** DSv2 `TableCatalog` over the versioned snapshot lake — the SQL
  * front door the snapshot stack (operators.Snapshots) was missing:
  *
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = s3a://bucket/lake   (or any LakeFs root)
  *
  *   CREATE TABLE graft.ns.t (k BIGINT, v STRING)
  *   INSERT INTO graft.ns.t SELECT ...
  *   INSERT OVERWRITE graft.ns.t SELECT ...
  *   SELECT * FROM graft.ns.t
  *   SELECT * FROM graft.ns.t VERSION AS OF 3
  *   SELECT * FROM graft.ns.t TIMESTAMP AS OF '2026-08-15 12:00:00'
  *
  * This is the surface every lakehouse format ships (Delta/Iceberg
  * register exactly this interface); here each table IS a
  * Snapshots root — `<root>/<ns...>/<name>` — so SQL and the
  * programmatic API (publish/readLog/compactLog/vacuumLog/clone/
  * branches) operate on the SAME directories interchangeably: an
  * existing snapshot root dropped under the catalog root is queryable
  * with zero migration, and a table created in SQL is a plain
  * Snapshots root any engine job can publish to.
  *
  * Flavor (the one bit the on-disk layout cannot carry, since
  * publishAppend IS publish): a `_GRAFT_TABLE` metadata file written
  * by CREATE TABLE holds `log` (default — SELECT unions the reader
  * window exactly like Snapshots.readLog; INSERT INTO appends one
  * committed version) or `snapshot` (SELECT reads the latest version
  * only; INSERT INTO publishes current∪new under a compare-and-swap
  * so two concurrent INSERTs conflict loudly instead of silently
  * losing one — Snapshots.publishIf). A root with no metadata file
  * (created programmatically) defaults to `log`, matching
  * publishAppend's semantics. CREATE TABLE ... TBLPROPERTIES
  * ('flavor'='snapshot') selects the other flavor.
  *
  * READ PATH: scans delegate to Spark's own parquet DSv2 table over
  * the RESOLVED file window — version/timestamp time travel, base
  * subsumption, and shallow-clone redirection are folded into the
  * file list driver-side (Snapshots' resolution), after which
  * Catalyst sees a vanilla parquet scan: vectorized columnar decode,
  * predicate pushdown, column pruning, partition-size splitting all
  * come from the engine, not re-implemented here. Schema evolution
  * across window versions null-fills through the declared read
  * schema (standard parquet clipping). Merge-on-read windows (keyed
  * tombstones or deletion vectors) refuse the raw SQL scan at
  * execution — those rows are served by readLogMerged/readLogDv; a
  * SQL DELETE (below) resolves through readLogDv and folds vectors.
  *
  * WRITES beyond INSERT: `DELETE FROM … WHERE` (filter-algebra
  * conditions, copy-on-write publish) and `TRUNCATE TABLE` (an empty
  * travelable version) — both one committed version, history intact.
  *
  * Time-travel identity: `VERSION AS OF v` resolves through the same
  * committed-window rule as `Snapshots.read(asOf = v)`; `TIMESTAMP AS
  * OF ts` goes through Snapshots.versionAtTimestamp (micros → the
  * newest version committed at or before ts), i.e. exactly
  * readAsOfTimestamp's resolution.
  *
  * Reference anchor: the reference app re-opens its single in-memory
  * store by name each session (conversadocs/bones.py:47 load_db);
  * this catalog is that naming layer, distributed and versioned. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(sys.error(
      s"spark.sql.catalog.$name.root must point at the lake root"))
      .replaceAll("/+$", "")
  }

  override def name(): String = catalogName

  /** One path segment of an identifier. Rejecting separators and
    * dot-dot here is what keeps `graft.evil` from escaping the lake
    * root — the identifier IS a filesystem path. */
  private def seg(s: String): String = {
    require(s.matches("[A-Za-z0-9_.-]+") && s != "." && s != "..",
      s"graft catalog identifiers must be [A-Za-z0-9_.-]+ segments: '$s'")
    s
  }

  private def nsPath(ns: Array[String]): String =
    (root +: ns.toSeq.map(seg)).mkString("/")

  private[sources] def tablePath(ident: Identifier): String =
    (root +: ident.namespace.toSeq.map(seg) :+ seg(ident.name))
      .mkString("/")

  /** A directory is a TABLE when it carries the metadata file or any
    * version dir; anything else under the root is a namespace. */
  private[sources] def isTable(path: String): Boolean =
    LakeFs.isFile(s"$path/${GraftCatalog.MetaFile}") ||
      LakeFs.list(path).exists(st =>
        st.isDirectory && st.getPath.getName.matches("v=\\d+"))

  // ---- tables ------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (namespace.nonEmpty && !LakeFs.isDir(p))
      throw new NoSuchNamespaceException(namespace)
    LakeFs.list(p).filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        isTable(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — v2 time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLongOption.getOrElse(sys.error(
      s"graft catalog versions are numeric snapshot versions: '$version'"))))

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    load(ident,
      Some(Snapshots.versionAtTimestamp(path, timestampMicros / 1000L)))
  }

  /** ANSI CHECK constraints route through ALTER TABLE (the Delta
    * surface); the capability flag is what lets Spark's resolver hand
    * them to [[alterTable]]. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) {
      // `graft.t.history` / `.files` / `.detail` — the Iceberg-style
      // metadata-table namespace trick: the leaf name selects the
      // metadata frame of the PARENT identifier when that parent is a
      // real table (a real table named e.g. `files` wins above)
      if (ident.namespace.nonEmpty &&
          GraftMetaTable.Names.contains(ident.name.toLowerCase)) {
        val parent = Identifier.of(ident.namespace.init,
          ident.namespace.last)
        val ppath = tablePath(parent)
        if (isTable(ppath)) {
          require(asOf.isEmpty,
            s"$catalogName.${ident.toString}: metadata tables carry " +
              "the FULL version history — time travel does not apply")
          val m = GraftCatalog.readMeta(ppath)
          return GraftMetaTable(s"$catalogName.${parent.toString}",
            ppath, m.flavor, ident.name.toLowerCase)
        }
      }
      throw new NoSuchTableException(ident)
    }
    val meta = GraftCatalog.readMeta(path)
    new GraftSqlTable(s"$catalogName.${ident.toString}", path,
      meta.flavor, asOf, meta.schema, meta.partCols, meta.checks)
  }

  override def createTable(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.map(c =>
        StructField(c.name, c.dataType, c.nullable))),
      partitions, properties)

  /** Shared CREATE/REPLACE validation: partition-transform checks,
    * flavor resolution, and the hive column reorder. `existingFlavor`
    * (REPLACE on a live table) wins over the default when the
    * statement doesn't name one — and conflicts loudly when it does. */
  private def validateCreate(schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String],
      existingFlavor: Option[String])
      : (String, StructType, Seq[String]) = {
    // PARTITIONED BY (c1, c2) — identity transforms over declared
    // top-level columns only (bucket/days/etc. would need reader-side
    // evaluation state the hive dir layout cannot carry)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1,
        s"PARTITIONED BY supports plain columns only, got: $t")
      val c = t.references.head.fieldNames.head
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"partition column '$c' is not in the table schema")
      c
    }
    require(partCols.size < schema.fields.length,
      "PARTITIONED BY cannot cover every column — no data columns left")
    val requested = Option(properties.get("flavor"))
    requested.foreach(f => require(f == "log" || f == "snapshot",
      s"flavor must be log|snapshot: '$f'"))
    existingFlavor.foreach(ex => requested.foreach(f => require(f == ex,
      s"REPLACE cannot change a table's flavor ($ex -> $f): a flavor " +
        "governs how EXISTING versions read — DROP and recreate")))
    val flavor = requested.orElse(existingFlavor).getOrElse("log")
    require(partCols.isEmpty || flavor == "log",
      "PARTITIONED BY applies to log-flavor tables (the append-log " +
        "shape hive partitioning serves); a snapshot-flavor table " +
        "re-lays its full state per version — partition the log, or " +
        "publish clustered state programmatically")
    // the hive rule: partition columns move to the END of the table
    // schema (a parquet scan emits data columns then partition
    // columns; a mid-schema partition column would force a repair
    // Project that breaks row-level plan matching)
    val ordered =
      if (partCols.isEmpty) schema
      else StructType(
        schema.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name))) ++
        partCols.map(c => schema(schema.fieldNames
          .indexWhere(_.equalsIgnoreCase(c)))))
    (flavor, ordered, partCols)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = tablePath(ident)
    if (isTable(path)) throw new TableAlreadyExistsException(ident)
    val (flavor, ordered, partCols) =
      validateCreate(schema, partitions, properties, None)
    LakeFs.mkdirs(path)
    GraftCatalog.writeMeta(path, flavor, Some(ordered), partCols)
    new GraftSqlTable(s"$catalogName.${ident.toString}", path, flavor,
      None, Some(ordered), partCols)
  }

  // -----------------------------------------------------------------
  // StagingTableCatalog: atomic CTAS / REPLACE / CREATE OR REPLACE
  // -----------------------------------------------------------------

  /** ATOMIC `CREATE TABLE AS SELECT` / `REPLACE TABLE [AS SELECT]` /
    * `CREATE OR REPLACE TABLE` — the Delta/Iceberg staging contract.
    * Without this interface Spark falls back to DROP + CREATE, which
    * (a) destroys the table's HISTORY (time travel gone) and (b)
    * leaves the table dropped if the SELECT fails mid-write. Staged:
    * the CTAS rows land in a SIBLING staging directory (never inside
    * the table root — snapshot listing must not see them), and
    * commitStagedChanges publishes them as ONE committed version
    * over the PRESERVED root — pre-replace versions stay travelable
    * exactly like TRUNCATE's empty version; abort removes only the
    * staging dir, the live table never observed anything. REPLACE
    * resets declared CHECK constraints (the Delta property-reset
    * shape) and keeps the table's flavor (changing one re-interprets
    * existing versions — refused loudly). A data-less REPLACE
    * commits an empty travelable version of the new schema. */
  override def stageCreate(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val path = tablePath(ident)
    if (isTable(path)) throw new TableAlreadyExistsException(ident)
    staged(ident, columns, partitions, properties, replaceExisting = false)
  }

  override def stageReplace(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    staged(ident, columns, partitions, properties, replaceExisting = true)
  }

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[V2Column], partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    staged(ident, columns, partitions, properties,
      replaceExisting = isTable(tablePath(ident)))

  private def staged(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String],
      replaceExisting: Boolean)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val schema = StructType(columns.map(c =>
      StructField(c.name, c.dataType, c.nullable)))
    val path = tablePath(ident)
    val existingFlavor =
      if (replaceExisting) Some(GraftCatalog.readMeta(path).flavor)
      else None
    val (flavor, ordered, partCols) =
      validateCreate(schema, partitions, properties, existingFlavor)
    val stageDir = path + ".__stage__" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    new GraftStagedTable(s"$catalogName.${ident.toString}", path, flavor,
      ordered, partCols, stageDir, replaceExisting)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` — METADATA-ONLY evolution (the
    * Delta shape): the declared schema in `_GRAFT_TABLE` gains the
    * column, no data file moves, existing versions null-fill through
    * standard parquet clipping, and the next INSERT writes the new
    * shape (which the window union already resolves). Only nullable
    * top-level adds: a NOT NULL add would instantly falsify every
    * existing row, and nested edits are outside the catalog's flat
    * column convention.
    *
    * RENAME COLUMN / DROP COLUMN are COPY-ON-WRITE: the current state
    * rewrites once through the flavor's publish path, then the
    * declared schema updates — the Delta default without
    * column-mapping mode (a metadata-only rename needs parquet field
    * ids these files don't carry). History below the rewrite keeps
    * the old shape honestly: time travel reads what each version
    * physically was. A column that exists only in the declared schema
    * (an ADD COLUMN never materialized) renames/drops metadata-only
    * at any table size. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    val meta = GraftCatalog.readMeta(path)
    val current = loadTable(ident).schema()
    def refreshed(schema: StructType, parts: Seq[String]) = {
      GraftCatalog.writeMeta(path, meta.flavor, Some(schema), parts,
        meta.checks)
      new GraftSqlTable(s"$catalogName.${ident.toString}", path,
        meta.flavor, None, Some(schema), parts, meta.checks)
    }
    // a CHECK that mentions the column would silently go stale (or
    // fail analysis) after the surgery — refuse; drop + re-add states
    // the intent explicitly
    def requireNoCheckRef(column: String): Unit =
      meta.checks.find(_._2.toLowerCase(java.util.Locale.ROOT)
          .matches(".*\\b" + java.util.regex.Pattern.quote(
            column.toLowerCase(java.util.Locale.ROOT)) + "\\b.*"))
        .foreach { case (n, sql) => sys.error(
          s"cannot alter column '$column': CHECK constraint '$n' " +
            s"references it ($sql) — DROP CONSTRAINT first") }
    // rewrite the table state once (skipped when the table is empty
    // or the column never reached a data file — metadata-only then)
    def rewriteState(column: String, nextParts: Seq[String])(
        f: org.apache.spark.sql.DataFrame
          => org.apache.spark.sql.DataFrame): Unit = {
      val s = SparkSession.active
      if (Snapshots.latestVersion(path).isEmpty) return
      val dataSchema =
        if (meta.flavor == "snapshot") Snapshots.read(s, path).schema
        else Snapshots.dataWindowSchema(s, path, None)
      if (!dataSchema.fieldNames.exists(_.equalsIgnoreCase(column)))
        return
      val state =
        if (meta.flavor == "snapshot") Snapshots.read(s, path)
        else Snapshots.readLogDv(s, path)
      if (meta.flavor == "snapshot") Snapshots.publish(f(state), path)
      else Snapshots.publishReplace(f(state), path, nextParts)
    }
    changes.toSeq match {
      case Seq(r: TableChange.RenameColumn) =>
        require(r.fieldNames.length == 1,
          "ALTER TABLE RENAME COLUMN: top-level columns only " +
            s"(got ${r.fieldNames.mkString(".")})")
        val from = r.fieldNames.head
        val to = r.newName
        val idx = current.fields.indexWhere(_.name.equalsIgnoreCase(from))
        require(idx >= 0, s"column '$from' does not exist")
        require(!current.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"column '$to' already exists")
        requireNoCheckRef(from)
        val nextParts = meta.partCols.map(c =>
          if (c.equalsIgnoreCase(from)) to else c)
        rewriteState(from, nextParts)(_.withColumnRenamed(from, to))
        return refreshed(StructType(current.fields.updated(idx,
          current.fields(idx).copy(name = to))), nextParts)
      case Seq(d: TableChange.DeleteColumn) =>
        require(d.fieldNames.length == 1,
          "ALTER TABLE DROP COLUMN: top-level columns only " +
            s"(got ${d.fieldNames.mkString(".")})")
        val column = d.fieldNames.head
        val exists = current.fieldNames.exists(_.equalsIgnoreCase(column))
        if (!exists && d.ifExists)
          return loadTable(ident)
        require(exists, s"column '$column' does not exist")
        require(!meta.partCols.exists(_.equalsIgnoreCase(column)),
          s"cannot drop partition column '$column' — the layout is " +
            "keyed on it; INSERT OVERWRITE an unpartitioned shape first")
        require(current.fields.length > 1,
          "cannot drop the only column")
        requireNoCheckRef(column)
        rewriteState(column, meta.partCols)(_.drop(column))
        return refreshed(StructType(current.fields.filterNot(
          _.name.equalsIgnoreCase(column))), meta.partCols)
      case _ =>
    }
    // ANSI constraint surface: ADD CONSTRAINT … CHECK validates the
    // EXISTING rows first (the Delta semantics — an invalid
    // constraint must never land), DROP CONSTRAINT removes by name.
    // Unique/PK/FK refuse: they'd be informational-only here, and a
    // constraint the engine can't enforce is a lie in the metadata.
    changes.collect {
      case a: TableChange.AddConstraint => Left(a)
      case d: TableChange.DropConstraint => Right(d)
    } match {
      case Nil => // fall through to column changes
      case cs =>
        require(cs.size == changes.size,
          "mix of constraint and column changes in one ALTER")
        var checks = meta.checks
        cs.foreach {
          case Left(a) => a.constraint() match {
            case c: org.apache.spark.sql.connector.catalog.constraints
                .Check =>
              require(c.name.matches("[A-Za-z0-9_]+"),
                s"constraint name must be an identifier: '${c.name}'")
              require(!checks.exists(_._1.equalsIgnoreCase(c.name)),
                s"constraint '${c.name}' already exists")
              val sql = c.predicateSql()
              require(sql != null && !sql.contains("\n"),
                "CHECK predicate must be single-line SQL")
              // validate existing rows: CHECK passes on TRUE and
              // NULL (SQL semantics), fails on FALSE
              val s = SparkSession.active
              if (Snapshots.latestVersion(path).nonEmpty) {
                import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
                val state =
                  if (meta.flavor == "snapshot") Snapshots.read(s, path)
                  else Snapshots.readLogDv(s, path)
                val bad = state
                  .filter(not(coalesce(expr(sql), lit(true)))).count()
                require(bad == 0L,
                  s"cannot ADD CONSTRAINT ${c.name}: $bad existing " +
                    s"row(s) violate CHECK ($sql)")
              }
              checks = checks :+ (c.name -> sql)
            case other => throw new UnsupportedOperationException(
              s"only CHECK constraints are supported (got $other) — " +
                "unique/primary-key/foreign-key would be " +
                "informational-only on a lake table")
          }
          case Right(d) =>
            val exists = checks.exists(_._1.equalsIgnoreCase(d.name))
            require(exists || d.ifExists,
              s"constraint '${d.name}' does not exist")
            checks = checks.filterNot(_._1.equalsIgnoreCase(d.name))
        }
        GraftCatalog.writeMeta(path, meta.flavor, Some(current),
          meta.partCols, checks)
        return new GraftSqlTable(s"$catalogName.${ident.toString}",
          path, meta.flavor, None, Some(current), meta.partCols, checks)
    }
    val added = changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "ALTER TABLE ADD COLUMN: top-level columns only " +
            s"(got ${add.fieldNames.mkString(".")})")
        require(add.isNullable,
          "ALTER TABLE ADD COLUMN: new columns must be nullable — " +
            "existing rows have no value for them")
        val name = add.fieldNames.head
        require(!current.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"column '$name' already exists")
        StructField(name, add.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${other.getClass.getSimpleName}: supported " +
          "changes are ADD COLUMN (metadata-only), RENAME/DROP " +
          "COLUMN (copy-on-write, one per statement), and CHECK " +
          "constraints — retypes need a rewritten shape (CTAS)")
    }
    val next = StructType(current.fields ++ added)
    GraftCatalog.writeMeta(path, meta.flavor, Some(next), meta.partCols,
      meta.checks)
    new GraftSqlTable(s"$catalogName.${ident.toString}", path,
      meta.flavor, None, Some(next), meta.partCols, meta.checks)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    if (!isTable(path)) false
    else { LakeFs.rmTree(path); true }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    require(LakeFs.rename(from, to),
      s"rename $from -> $to failed (cross-store renames need a copy job)")
  }

  // ---- namespaces --------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    LakeFs.list(root).filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        !isTable(st.getPath.toString))
      .map(st => Array(st.getPath.getName)).toArray

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = nsPath(namespace)
    if (!LakeFs.isDir(p) || isTable(p))
      throw new NoSuchNamespaceException(namespace)
    LakeFs.list(p).filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        !isTable(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (LakeFs.isDir(nsPath(namespace)) && !isTable(nsPath(namespace)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    LakeFs.mkdirs(nsPath(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade)
      require(LakeFs.list(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
    LakeFs.rmTree(p)
    true
  }
}

object GraftCatalog {
  /** Declare the flavor of an EXISTING programmatic root so SQL reads
    * it correctly. The flavor bit is genuinely unknowable from the
    * layout (publishAppend IS publish on disk): an unregistered root
    * defaults to `log` — right for append logs (readLog's semantics,
    * the engine's raw default), but a root whose versions are FULL
    * STATES (read-modify-publish snapshot tables) would double-count
    * under the union. One marker write closes that: register such
    * roots as `snapshot` before pointing SQL at them. */
  def register(path: String, flavor: String,
      partCols: Seq[String] = Nil): Unit = {
    require(flavor == "log" || flavor == "snapshot",
      s"flavor must be log|snapshot: '$flavor'")
    writeMeta(path, flavor, None, partCols)
  }

  /** Table metadata: line 1 = flavor, optionally followed by
    * ` parts=c1,c2` (the hive partition columns of a PARTITIONED BY
    * table); line 2 (optional) = declared StructType JSON (the schema
    * of a created-but-never-published table; once data exists the
    * newest window's footers govern — except partitioned tables,
    * whose declared schema always governs, since partition values
    * live in dir names, not footers). */
  private[sources] val MetaFile = "_GRAFT_TABLE"

  private[sources] final case class Meta(flavor: String,
      schema: Option[StructType], partCols: Seq[String],
      checks: Seq[(String, String)] = Nil)

  private[sources] def readMeta(path: String): Meta =
    LakeFs.readString(s"$path/$MetaFile") match {
      case None => Meta("log", None, Nil)
      case Some(c) =>
        val lines = c.linesIterator.toSeq
        val head = lines.headOption.map(_.trim).filter(_.nonEmpty)
          .getOrElse("log")
        val toks = head.split("\\s+").toSeq
        val parts = toks.collectFirst {
          case t if t.startsWith("parts=") =>
            t.stripPrefix("parts=").split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
        }.getOrElse(Nil)
        // lines 3+: `check <name> <predicate sql>` — one CHECK
        // constraint per line (names are identifiers, the SQL is the
        // single-line predicateSql Spark hands the catalog)
        val checks = lines.drop(2)
          .filter(_.startsWith("check "))
          .map { l =>
            val rest = l.stripPrefix("check ")
            val sp = rest.indexOf(' ')
            (rest.take(sp), rest.drop(sp + 1))
          }
        Meta(toks.headOption.getOrElse("log"),
          lines.drop(1).headOption.filter(_.nonEmpty)
            .map(j => DataType.fromJson(j).asInstanceOf[StructType]),
          parts, checks)
    }

  private[sources] def writeMeta(path: String, flavor: String,
      schema: Option[StructType], partCols: Seq[String] = Nil,
      checks: Seq[(String, String)] = Nil): Unit = {
    require(checks.isEmpty || schema.nonEmpty,
      "constraints need a declared schema line to sit behind")
    LakeFs.write(s"$path/$MetaFile",
      flavor +
        (if (partCols.nonEmpty) " parts=" + partCols.mkString(",")
         else "") +
        schema.map("\n" + _.json).getOrElse("") +
        checks.map { case (n, sql) => s"\ncheck $n $sql" }.mkString)
  }
}

/** One catalog table = one Snapshots root, resolved at load time
  * (`asOf` pins time travel). Reads delegate to [[ParquetTable]] over
  * the resolved window's files; writes go through the snapshot
  * publish protocol (the V1 bridge — same shape as the graftsnap
  * connector's batch write, SnapshotStreamSource.scala). */
class GraftSqlTable(fullName: String, private[sources] val root: String,
    private[sources] val flavor: String,
    private[sources] val asOf: Option[Long], declared: Option[StructType],
    private[sources] val partCols: Seq[String] = Nil,
    private[sources] val checks: Seq[(String, String)] = Nil)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** The table's CHECK constraints (ANSI constraint surface, the
    * Delta `ALTER TABLE … ADD CONSTRAINT … CHECK` shape) — reported
    * enforced+validated: ADD scans existing rows before it lands,
    * and every write revalidates (Spark's constraint framework plans
    * the validation into the write). */
  override def constraints(): Array[
      org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    checks.map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql)
        .validationStatus(org.apache.spark.sql.connector.catalog
          .constraints.Constraint.ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints
          .Constraint
    }.toArray

  private def spark = SparkSession.active

  /** The resolved read window: snapshot flavor = the one picked
    * version's data dirs (clone markers followed); log flavor = the
    * full reader-window file list (base subsumption + clones,
    * tombstones refused). PARTITIONED tables hand over the window's
    * version DIRS instead — each is a base path for Spark's hive
    * partition discovery, which restores the `col=val` columns and
    * lets Catalyst prune whole partition directories before a single
    * footer opens. Empty table → no paths (declared schema serves the
    * scan an empty result). */
  private lazy val resolvedPaths: Seq[String] =
    if (Snapshots.latestVersion(root).isEmpty) Nil
    else if (flavor == "snapshot")
      Snapshots.readDirs(root, asOf)
    else if (partCols.nonEmpty) Snapshots.logDataDirs(root, asOf)
    else Snapshots.batchFiles(root, asOf,
      Map.empty[String, (Option[BigDecimal], Option[BigDecimal])])

  /** The window holds delete-metadata batches (keyed tombstones or
    * deletion vectors) — servable by the merge readers, not by a raw
    * file scan; the scan defers its refusal to EXECUTION because
    * DELETE planning builds (and discards) a scan first. */
  private lazy val morWindow: Boolean =
    flavor != "snapshot" && Snapshots.latestVersion(root).nonEmpty &&
      Snapshots.hasDeleteMetadata(root, asOf)

  override lazy val schema: StructType = {
    if (partCols.nonEmpty)
      // partition values live in dir names, not footers — the
      // declared schema (which CREATE always writes) governs
      declared.getOrElse(sys.error(
        s"$fullName: partitioned table with no declared schema"))
    else if (Snapshots.latestVersion(root).isEmpty)
      declared.getOrElse(sys.error(
        s"$fullName: empty table with no declared schema"))
    else {
      val data =
        if (flavor == "snapshot") Snapshots.read(spark, root, asOf).schema
        else Snapshots.dataWindowSchema(spark, root, asOf)
      // ALTER TABLE ADD COLUMN is metadata-only: declared-only
      // columns append and null-fill through parquet clipping (the
      // declared schema is table-level, so travel reads see it too —
      // nullable adds are harmless backwards)
      declared match {
        case Some(d) =>
          val extra = d.fields.filterNot(f =>
            data.fieldNames.exists(_.equalsIgnoreCase(f.name)))
          if (extra.isEmpty) data else StructType(data.fields ++ extra)
        case None => data
      }
    }
  }

  override def name(): String =
    fullName + asOf.map(v => s"@v$v").getOrElse("")

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def properties(): util.Map[String, String] =
    Map("flavor" -> flavor, "location" -> root).asJava

  /** Report the hive partitioning so Spark-native surfaces (SHOW
    * CREATE TABLE, DESCRIBE, catalog introspection) render it. */
  override def partitioning(): Array[Transform] =
    partCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions
        .identity(c)).toArray

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    if (morWindow) {
      // schema resolves, planning succeeds (DELETE needs both), and
      // only an actual EXECUTION of the raw scan refuses
      val s = schema
      val msg = s"$fullName: the window holds merge-on-read delete " +
        "batches — a raw SQL scan cannot apply them; read through " +
        "Snapshots.readLogMerged/readLogDv, or fold first " +
        "(compactLogMerged/compactLogDv — a SQL DELETE also folds)"
      val refusing = new ScanBuilder {
        override def build(): org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.Scan {
            override def readSchema(): StructType = s
            override def toBatch
                : org.apache.spark.sql.connector.read.Batch =
              new org.apache.spark.sql.connector.read.Batch {
                override def planInputPartitions(): Array[
                  org.apache.spark.sql.connector.read.InputPartition] =
                  sys.error(msg)
                override def createReaderFactory(): org.apache.spark.sql
                    .connector.read.PartitionReaderFactory = sys.error(msg)
              }
          }
      }
      // batch refuses, but a STREAMING read still serves: the
      // graftsnap tail skips delete-metadata batches by contract
      // (they are markers, not data rows)
      return new org.apache.spark.sql.GraftDualScanBuilder(refusing,
        () => new SnapshotStreamScanBuilder(root, s, options).build())
    }
    if (partCols.nonEmpty) {
      // partitioned window: per-root partition parse merged into one
      // spec (GraftPartIndex — Spark's discovery refuses multiple
      // roots), then Spark's own parquet scan builder over it, so
      // pushdown + partition PRUNING + vectorized decode all come
      // from the engine
      val idx = org.apache.spark.sql.execution.datasources
        .GraftPartIndex(spark, resolvedPaths, schema, partCols)
      val dataSchema = StructType(schema.fields.filterNot(f =>
        partCols.exists(_.equalsIgnoreCase(f.name))))
      val batch = org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetScanBuilder(spark, idx, schema, dataSchema, options)
      val partSchema = StructType(schema.fields.filter(f =>
        partCols.exists(_.equalsIgnoreCase(f.name))))
      return new org.apache.spark.sql.GraftDualScanBuilder(batch,
        () => sys.error(
          s"$fullName: streaming reads of a PARTITIONED table are " +
            "not supported — the version tail reads files, and the " +
            "partition values live in dir names; tail an " +
            "unpartitioned log instead"),
        // DPP: a dim join on the partition column runtime-prunes the
        // listed files (GraftRuntimePartScan — the Iceberg seam)
        wrap = {
          case p: org.apache.spark.sql.execution.datasources.v2.parquet
              .ParquetScan =>
            new org.apache.spark.sql.GraftRuntimePartScan(p, partSchema)
          case other => other
        })
    }
    val delegate = ParquetTable(name(), spark,
      options, resolvedPaths, Some(schema),
      classOf[ParquetFileFormat])
    // batch scans delegate wholesale to the parquet builder (pushdown
    // , pruning, DPP, stats all forwarded); `spark.readStream.table`
    // routes to the graftsnap commit-log tail — version-by-version
    // exactly-once delivery, the same MicroBatchStream as
    // format("graftsnap"), sharing its vacuum fence and
    // compaction-skip contract
    new org.apache.spark.sql.GraftDualScanBuilder(
      delegate.newScanBuilder(options),
      () => {
        require(asOf.isEmpty,
          s"$fullName: cannot stream a time-travel view")
        require(flavor != "snapshot",
          s"$fullName: streaming reads tail a LOG's committed " +
            "versions; a snapshot-flavor table rewrites its full " +
            "state per version — tail the upstream log instead")
        require(partCols.isEmpty,
          s"$fullName: streaming reads of a PARTITIONED table are " +
            "not supported — the version tail reads files, and the " +
            "partition values live in dir names; tail an " +
            "unpartitioned log instead")
        new SnapshotStreamScanBuilder(root, schema, options).build()
      })
  }

  /** The filter subset SQL DELETE translates losslessly to Columns —
    * anything else makes [[canDeleteWhere]] false and Spark reports
    * the condition as undeletable instead of silently deleting the
    * wrong rows. */
  private def toColumn(
      f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.{sources => sf}
    f match {
      case sf.EqualTo(a, v) => Some(col(a) === lit(v))
      case sf.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sf.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sf.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sf.LessThan(a, v) => Some(col(a) < lit(v))
      case sf.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sf.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sf.IsNull(a) => Some(col(a).isNull)
      case sf.IsNotNull(a) => Some(col(a).isNotNull)
      case sf.And(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case sf.Or(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case sf.Not(c) => toColumn(c).map(not)
      case sf.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sf.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sf.StringContains(a, v) => Some(col(a).contains(v))
      case _: sf.AlwaysTrue => Some(lit(true))
      case _: sf.AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  /** Current table state through the flavor's honest reader —
    * deletion-vector windows resolve through readLogDv (a SQL DELETE
    * composes with prior positional deletes by folding them), key
    * tombstones refuse (the keyed MoR discipline owns those rows). */
  private def currentState(s: SparkSession)
      : org.apache.spark.sql.DataFrame =
    if (flavor == "snapshot") Snapshots.read(s, root)
    else Snapshots.readLogDv(s, root)

  /** `DELETE FROM graft.t WHERE …` — copy-on-write through the
    * snapshot protocol: publish the kept rows as one new committed
    * version (snapshot flavor: a plain version; log flavor: a base
    * that subsumes the window), history below travelable as ever.
    * SQL semantics: a row is deleted when the condition is TRUE;
    * FALSE and NULL both keep it. Single-writer like every publish. */
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val s = spark
    val conds = filters.toSeq.map(f => toColumn(f).getOrElse(
      sys.error(s"$fullName: untranslatable DELETE condition $f")))
    val cond = conds.foldLeft(lit(true))(_ && _)
    val kept = currentState(s).filter(not(coalesce(cond, lit(false))))
    if (flavor == "snapshot") Snapshots.publish(kept, root)
    else Snapshots.publishReplace(kept, root, partCols)
    ()
  }

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => toColumn(f).isDefined)

  /** `TRUNCATE TABLE graft.t` — publish an empty version (log: a
    * base), so the truncate is itself time-travelable history. */
  override def truncateTable(): Boolean = {
    val s = spark
    val empty = s.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    if (flavor == "snapshot") Snapshots.publish(empty, root)
    else Snapshots.publishReplace(empty, root, partCols)
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"$fullName: cannot write to a time-travel view")
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation
            : org.apache.spark.sql.sources.InsertableRelation =
          (df: org.apache.spark.sql.DataFrame, _: Boolean) => {
            if (flavor == "snapshot") {
              if (replace) Snapshots.publish(df, root)
              else Snapshots.latestVersion(root) match {
                case None => Snapshots.publish(df, root)
                case Some(v) =>
                  // append-to-snapshot is read-modify-write: CAS on
                  // the version read, so racing INSERT INTOs conflict
                  // loudly (SnapshotConflict) instead of losing rows
                  Snapshots.publishIf(
                    Snapshots.read(df.sparkSession, root)
                      .unionByName(df, allowMissingColumns = true),
                    root, expected = v)
              }
            } else {
              if (replace) Snapshots.publishReplace(df, root, partCols)
              else if (partCols.nonEmpty)
                Snapshots.publishPartitioned(df, root, partCols)
              else Snapshots.publishAppend(df, root)
            }
            ()
          }

        /** `df.writeStream.toTable("graft.t")` — each epoch lands as
          * one committed log version through the graftsnap staged
          * write (exactly-once via the in-version epoch tag). Log
          * flavor + append mode only, the graftsnap contract. */
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          require(flavor != "snapshot",
            s"$fullName: streaming writes append committed log " +
              "versions; a snapshot-flavor table is read-modify-write " +
              "— use foreachBatch with Snapshots.publishIf")
          require(partCols.isEmpty,
            s"$fullName: streaming writes to a PARTITIONED table are " +
              "not supported — the epoch-staged writer lays files " +
              "flat; use foreachBatch with Snapshots.publishPartitioned")
          require(checks.isEmpty,
            s"$fullName: streaming writes bypass the batch planner's " +
              "CHECK enforcement — validate in foreachBatch (filter + " +
              "publishAppend), or drop the constraint")
          if (replace) throw new UnsupportedOperationException(
            s"$fullName: streaming write supports append mode only")
          val scope = Option(info.options.get("streamid")) match {
            case Some(sid) =>
              require(sid.matches("[A-Za-z0-9_-]+"),
                s"streamId must be [A-Za-z0-9_-]+: '$sid'")
              sid
            case None =>
              info.queryId().replaceAll("[^A-Za-z0-9_-]", "-")
          }
          new GraftsnapStreamingWrite(root, info.schema(), scope)
        }
      }
    }
  }
}

/** The staged table behind GraftCatalog's atomic CTAS/REPLACE: CTAS
  * rows write as plain parquet into `stageDir` (a SIBLING of the
  * table root — never inside it, so snapshot listing cannot observe
  * half-written state), and the commit publishes them as ONE
  * committed version over the preserved root. Abort deletes only the
  * staging directory. */
class GraftStagedTable(fullName: String, root: String, flavor: String,
    ordered: StructType, partCols: Seq[String], stageDir: String,
    replaceExisting: Boolean)
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with SupportsWrite {

  override def name(): String = fullName
  override def schema(): StructType = ordered
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // CTAS/RTAS sends truncate-before-write; the staging dir IS the
      // truncation — nothing to do
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation
            : org.apache.spark.sql.sources.InsertableRelation =
          (df: org.apache.spark.sql.DataFrame, _: Boolean) =>
            df.write.mode("overwrite").parquet(stageDir)
      }
    }

  override def commitStagedChanges(): Unit = {
    val s = org.apache.spark.sql.SparkSession.active
    // The data-less CTAS (CREATE TABLE t AS SELECT ... WHERE false can
    // leave a stage dir with no part files, or no dir at all) is the
    // ONLY case that commits empty; a genuine read failure (corrupt
    // staging write, transient FS error) must PROPAGATE so Spark calls
    // abortStagedChanges — a catch-all here would silently commit an
    // empty version over real data.
    val hasParts = LakeFs.exists(stageDir) && LakeFs.leaves(stageDir)
      .exists(_.getPath.getName.endsWith(".parquet"))
    val staged =
      if (hasParts) s.read.schema(ordered).parquet(stageDir)
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], ordered)
    if (!replaceExisting) LakeFs.mkdirs(root)
    // REPLACE resets declared schema/partitioning and drops CHECK
    // constraints (the Delta property-reset shape); history below the
    // new version stays travelable in its original shape
    GraftCatalog.writeMeta(root, flavor, Some(ordered), partCols)
    // publishReplace for BOTH log branches: it writes the base marker
    // that makes logWindow subsume pre-replace versions. The previous
    // partitioned branch used publishPartitioned (a plain append, no
    // base marker), so REPLACE ... PARTITIONED BY ... AS SELECT on an
    // existing table kept the old rows visible — silently not a
    // replace.
    if (flavor == "snapshot") Snapshots.publish(staged, root)
    else Snapshots.publishReplace(staged, root, partCols)
    LakeFs.rmTree(stageDir)
  }

  override def abortStagedChanges(): Unit = LakeFs.rmTree(stageDir)
}
