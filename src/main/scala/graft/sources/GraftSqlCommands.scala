package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, monotonically_increasing_id, when}

import graft.operators.Snapshots

/** SQL `UPDATE` and `MERGE INTO` for lake-catalog tables.
  *
  * Spark's parser and analyzer fully resolve `UpdateTable` /
  * `MergeIntoTable` for ANY v2 table — assignments aligned, star
  * actions expanded, conditions type-checked — and only the PLANNER
  * refuses tables that don't implement the row-level-operation
  * connector API (`UNSUPPORTED_FEATURE.TABLE_OPERATION`). This rule
  * intercepts the two resolved plans over [[GraftSqlTable]] relations
  * at post-hoc resolution (the same seam Delta's
  * PreprocessTableUpdate/Merge uses) and swaps in commands that
  * execute through the snapshot publish protocol:
  *
  *   UPDATE graft.t SET v = v || '!', p = p * 2 WHERE k < 10
  *   MERGE INTO graft.t USING src ON t.k = src.k
  *     WHEN MATCHED AND src.del THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET v = src.v
  *     WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
  *     WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'orphan'
  *
  * Both are copy-on-write: ONE new committed version holds the next
  * state (snapshot flavor: a plain version; log flavor: a base that
  * subsumes the window — `Snapshots.publishReplace`), so every
  * UPDATE/MERGE is itself time-travelable history, exactly like the
  * SQL DELETE/TRUNCATE surface (GraftCatalog scaladoc). The
  * group-based DSv2 rewrite (SupportsRowLevelOperations +
  * ReplaceData) was deliberately NOT used: with no sub-table group
  * granularity its plan degenerates to the same full-state rewrite,
  * but forces the write through a V2 BatchWrite limited to the
  * graftsnap flat-primitive encoder — the command form publishes
  * through the engine's own parquet writer and covers every type the
  * catalog can CREATE.
  *
  * Scale shape: UPDATE is one scan + one projected write (the same
  * cost as the CoW DELETE). MERGE is one join of target×source on
  * the merge condition (equi-conditions shuffle/broadcast like any
  * join) + one written state; the SQL-standard ambiguity rule (a
  * target row matching >1 source rows errors) costs one extra
  * aggregate over the cached join — the same price
  * Snapshots.publishMerge pays for its key-count check.
  *
  * Deletion-vector windows fold first (compactLogDv — the SQL DELETE
  * rule); keyed-tombstone windows refuse with the readLogMerged hint
  * (one delete discipline per table). Time-travel views refuse all
  * writes. */
object GraftRowLevelSql extends Rule[LogicalPlan] {

  /** The relation plan (alias kept — action expressions may reference
    * it) and its catalog table, when `plan` is a GraftSqlTable scan. */
  private def graftTable(plan: LogicalPlan): Option[GraftSqlTable] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSqlTable => Some(g)
        case _ => None
      }
      case a: SubqueryAlias => graftTable(a.child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition) if u.resolved =>
        graftTable(table) match {
          case Some(g) => GraftUpdateCommand(table, g, assignments, condition)
          case None => u
        }
      case m @ MergeIntoTable(target, source, cond, matched, notMatched,
          notMatchedBySource, withSchemaEvolution) if m.resolved =>
        graftTable(target) match {
          case Some(g) =>
            require(!withSchemaEvolution,
              s"${g.name()}: MERGE WITH SCHEMA EVOLUTION is not " +
                "supported — evolve by publishing the new shape " +
                "(readers null-fill)")
            GraftMergeCommand(target, g, source, cond, matched,
              notMatched, notMatchedBySource)
          case None => m
        }
    }
}

private[sources] object RowLevelExec {

  /** Shared write-entry checks + the MoR pre-fold. Returns false when
    * the op should no-op (UPDATE on a never-published table). */
  def prepare(s: SparkSession, t: GraftSqlTable, op: String): Boolean = {
    require(t.asOf.isEmpty,
      s"${t.name()}: cannot $op a time-travel view")
    val live = Snapshots.latestVersion(t.root).nonEmpty
    if (live && t.flavor != "snapshot" &&
        Snapshots.hasDeleteMetadata(t.root, None))
      // DV windows fold into a plain base first (keyed tombstones
      // refuse inside compactLogDv with the readLogMerged hint)
      Snapshots.compactLogDv(s, t.root)
    live
  }

  def publishState(t: GraftSqlTable, df: DataFrame): Unit = {
    // CHECK constraints: UPDATE/MERGE compute the next state OUTSIDE
    // Spark's write planning (which enforces them on INSERT), so the
    // published frame carries its own executor-side validation — an
    // inline raise_error filter, no extra pass: the write job itself
    // fails on the first violating row (CHECK passes on TRUE/NULL)
    import org.apache.spark.sql.functions.{coalesce, expr, lit, raise_error, when}
    val checked = t.checks.foldLeft(df) { case (d, (n, sql)) =>
      d.filter(when(coalesce(expr(sql), lit(true)), lit(true))
        .otherwise(raise_error(org.apache.spark.sql.functions.concat(
          lit(s"[CHECK_CONSTRAINT_VIOLATION] CHECK constraint $n " +
            s"($sql) violated by an updated/merged row"))).cast("boolean")))
    }
    if (t.flavor == "snapshot") Snapshots.publish(checked, t.root)
    else Snapshots.publishReplace(checked, t.root, t.partCols)
    ()
  }

  /** The assignment value for `attr`, when one targets it. Keys are
    * resolved target attributes (nested-field updates refuse — the
    * catalog's flat-column convention). */
  def assignedValue(assignments: Seq[Assignment], attr: Attribute)
      : Option[Expression] =
    assignments.collectFirst {
      case Assignment(k: AttributeReference, v)
          if k.exprId == attr.exprId || k.name == attr.name => v
    }

  def refuseNested(assignments: Seq[Assignment], op: String): Unit =
    assignments.foreach {
      case Assignment(_: AttributeReference, _) => ()
      case Assignment(other, _) => sys.error(
        s"$op on a nested field is not supported: ${other.sql}")
    }
}

/** `UPDATE <graft table> SET … [WHERE …]` — one scan, one projected
  * CoW publish. SQL semantics: a row updates when the condition is
  * TRUE; FALSE and NULL keep it unchanged (`when` passes NULL to the
  * otherwise branch). Assignment values evaluate against the
  * PRE-update row (all columns project from the same input row). */
case class GraftUpdateCommand(target: LogicalPlan, table: GraftSqlTable,
    assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    // a never-published table has no rows to update: no-op, no
    // empty-version noise
    if (!RowLevelExec.prepare(spark, table, "UPDATE")) return Seq.empty
    RowLevelExec.refuseNested(assignments, "UPDATE")
    val ds = GraftBridge.ofRows(spark, target)
    val cond = condition.map(GraftBridge.column).getOrElse(lit(true))
    val out = target.output.map { attr =>
      val orig = GraftBridge.column(attr)
      RowLevelExec.assignedValue(assignments, attr) match {
        case Some(v) =>
          when(cond, GraftBridge.column(v).cast(attr.dataType))
            .otherwise(orig).as(attr.name)
        case None => orig.as(attr.name)
      }
    }
    RowLevelExec.publishState(table, ds.select(out: _*))
    Seq.empty
  }
}

/** `MERGE INTO <graft table> USING <source> ON <cond> WHEN …` — the
  * full three-branch merge: matched (UPDATE/DELETE, first action
  * whose condition holds; none → row kept), not matched (INSERT),
  * not matched by source (UPDATE/DELETE). One full-outer join on the
  * merge condition decides every row's branch; the next state
  * publishes as one CoW version. */
case class GraftMergeCommand(target: LogicalPlan, table: GraftSqlTable,
    source: LogicalPlan, mergeCondition: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction])
    extends LeafRunnableCommand {

  // joined-frame marker columns (names no user table can collide with:
  // the catalog's identifier grammar rejects them)
  private val TidCol = "__graft_merge_tid"
  private val SrcCol = "__graft_merge_src"

  private def actions(as: Seq[MergeAction], op: String): Seq[MergeAction] = {
    as.foreach {
      case u: UpdateAction => RowLevelExec.refuseNested(u.assignments, op)
      case i: InsertAction => RowLevelExec.refuseNested(i.assignments, op)
      case _: DeleteAction => ()
      case other => sys.error(s"$op: unsupported merge action $other")
    }
    as
  }

  /** First-match action chain for row survival: DELETE → false,
    * UPDATE/INSERT → true, no action matching → `default`. */
  private def keepChain(as: Seq[MergeAction], default: Column): Column =
    as.foldRight(default) { (a, rest) =>
      val c = a.condition.map(GraftBridge.column).getOrElse(lit(true))
      a match {
        case _: DeleteAction => when(c, lit(false)).otherwise(rest)
        case _ => when(c, lit(true)).otherwise(rest)
      }
    }

  /** First-match action chain for `attr`'s value. Deletes keep the
    * original value (the keep chain drops the row; the value never
    * surfaces). */
  private def valueChain(as: Seq[MergeAction], attr: Attribute,
      orig: Column, default: Column): Column =
    as.foldRight(default) { (a, rest) =>
      val c = a.condition.map(GraftBridge.column).getOrElse(lit(true))
      val v = a match {
        case u: UpdateAction =>
          RowLevelExec.assignedValue(u.assignments, attr)
            .map(e => GraftBridge.column(e).cast(attr.dataType))
            .getOrElse(orig)
        case i: InsertAction =>
          RowLevelExec.assignedValue(i.assignments, attr)
            .map(e => GraftBridge.column(e).cast(attr.dataType))
            .getOrElse(lit(null).cast(attr.dataType))
        case _ => orig // DeleteAction (dropped by the keep chain);
                       // star actions can't reach here (actions())
      }
      when(c, v).otherwise(rest)
    }

  override def run(spark: SparkSession): Seq[Row] = {
    RowLevelExec.prepare(spark, table, "MERGE INTO")
    actions(matchedActions, "MERGE matched")
    actions(notMatchedActions, "MERGE not-matched")
    actions(notMatchedBySourceActions, "MERGE not-matched-by-source")

    val tgt = GraftBridge.ofRows(spark, target)
      .withColumn(TidCol, monotonically_increasing_id())
    val src = GraftBridge.ofRows(spark, source)
      .withColumn(SrcCol, lit(true))
    val joined = tgt.join(src, GraftBridge.column(mergeCondition),
      "full_outer").cache()
    try {
      val tp = col(TidCol).isNotNull
      val sp = col(SrcCol).isNotNull
      if (matchedActions.nonEmpty || notMatchedActions.nonEmpty) {
        // SQL-standard cardinality rule: >1 source matches for one
        // target row is nondeterministic — error, like
        // Snapshots.publishMerge's key-count check
        val dup = joined.filter(tp && sp).groupBy(col(TidCol))
          .count().filter(col("count") > 1).limit(1).count()
        require(dup == 0L,
          s"${table.name()}: MERGE ambiguity — a target row matches " +
            "more than one source row")
      }
      val keep = when(tp && sp, keepChain(matchedActions, lit(true)))
        .when(tp && !sp, keepChain(notMatchedBySourceActions, lit(true)))
        .otherwise(keepChain(notMatchedActions, lit(false)))
      val out = target.output.map { attr =>
        val orig = GraftBridge.column(attr)
        when(tp && sp, valueChain(matchedActions, attr, orig, orig))
          .when(tp && !sp,
            valueChain(notMatchedBySourceActions, attr, orig, orig))
          .otherwise(valueChain(notMatchedActions, attr, orig,
            lit(null).cast(attr.dataType)))
          .as(attr.name)
      }
      RowLevelExec.publishState(table, joined.filter(keep).select(out: _*))
    } finally { joined.unpersist(); () }
    Seq.empty
  }
}
