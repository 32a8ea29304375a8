package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, the latest right row of the
  * same key with right.ts <= left.ts.
  *
  * Spark has no as-of operator; the compositional form (union + last
  * window, graft.queries.Events.asofJoin) works but widens every row
  * to the union schema and runs a window over the merged stream. This
  * node is the (c)-tier implementation from the custom-operator
  * ladder: both sides hash-partitioned by key and sorted by (key, ts)
  * — the same distribution a sort-merge join would demand — then a
  * single linear merge per partition carries the most recent right
  * row per key. O(n_left + n_right), no widened shuffle, no window
  * state.
  *
  * v1 constraints (checked by the API): key is LongType, ts is
  * TimestampType/LongType (both evaluate to Long internally).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    keyL: Attribute, tsL: Attribute,
    keyR: Attribute, tsR: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, kl, tl, kr, tr) =>
      AsOfJoinExec(planLater(l), planLater(r), kl, tl, kr, tr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    keyL: Attribute, tsL: Attribute,
    keyR: Attribute, tsR: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyL)) :: ClusteredDistribution(Seq(keyR)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending)) ::
      Seq(SortOrder(keyR, Ascending), SortOrder(tsR, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // widen to Expression before binding: bindReference casts its
    // result back to the argument's static type, and BoundReference
    // is not an Attribute
    val keyLB = BindReferences.bindReference(keyL: Expression, left.output)
    val tsLB = BindReferences.bindReference(tsL: Expression, left.output)
    val keyRB = BindReferences.bindReference(keyR: Expression, right.output)
    val tsRB = BindReferences.bindReference(tsR: Expression, right.output)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      // lookahead right row (not yet consumed)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // latest consumed right row and its key
      var lastKey = Long.MinValue
      var last: InternalRow = null
      var lastValid = false

      lIter.map { lRow =>
        val lkv = keyLB.eval(lRow)
        val ltv = tsLB.eval(lRow)
        if (lkv == null || ltv == null) {
          // null key/ts matches nothing: defined semantics, no NPE
          joined(lRow, nullRight)
          proj(joined)
        } else {
          val lk = lkv.asInstanceOf[Long]
          val lt = ltv.asInstanceOf[Long]
          var advancing = true
          while (advancing && rRow != null) {
            val rkv = keyRB.eval(rRow)
            val rtv = if (rkv == null) null else tsRB.eval(rRow)
            if (rkv == null || rtv == null) {
              // unmatchable right row (nulls sort first): consume + drop
              rRow = if (rIter.hasNext) rIter.next() else null
            } else {
              val rk = rkv.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rtv.asInstanceOf[Long] <= lt)) {
                lastKey = rk
                last = rRow.copy()
                lastValid = true
                rRow = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            }
          }
          if (lastValid && lastKey == lk) joined(lRow, last)
          else joined(lRow, nullRight)
          proj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}
