package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Snapshots

/** Table-valued functions over the lake catalog — the SQL face of
  * the change-data-feed reader (Delta ships the identical surface as
  * `table_changes(tbl, start, end)`; ours carries the merge key
  * explicitly because graft MoR state is key-parametrized rather
  * than a table property):
  *
  *   SELECT * FROM table_changes('graftlake.t', 'k', 1, 3)
  *
  * Resolution goes through the SAME catalog the named table lives in
  * (catalogManager lookup → GraftCatalog.tablePath), so the TVF and
  * `SELECT … FROM graftlake.t VERSION AS OF` can never disagree
  * about which directory a name means. The emitted plan is
  * Snapshots.readChanges' net-effect diff — insert / delete /
  * update_preimage / update_postimage rows between the two committed
  * versions — computed as two as-of merged reads full-outer-joined
  * on the key: one shuffle per side at any scale, never a row-count
  * dependent driver step. Arguments must be literals (the plan is
  * built at resolution time — the Delta TVF contract). */
object GraftTvf {

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a literal string, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a literal integer, got $other")
  }

  def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "table_changes(table, key, fromVersion, toVersion) takes 4 arguments")
    val name = strArg(args(0), "table")
    val key = strArg(args(1), "key")
    val from = longArg(args(2), "fromVersion")
    val to = longArg(args(3), "toVersion")
    val s = SparkSession.active
    val parts = name.split('.')
    require(parts.length >= 2,
      s"table_changes: table must be catalog-qualified " +
        s"('<catalog>.<...ns>.<name>'), got '$name'")
    val cat = s.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"table_changes: '${parts.head}' is not a graft lake catalog " +
          s"(${other.getClass.getName})")
    }
    val path = cat.tablePath(
      Identifier.of(parts.drop(1).dropRight(1), parts.last))
    Snapshots.readChanges(s, path, key, from, to).queryExecution.analyzed
  }
}
