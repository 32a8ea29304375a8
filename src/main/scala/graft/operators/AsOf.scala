package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.plans.{AsOfJoinPlan, AsOfStrategy}

/** Public API for the native as-of join (graft.plans.AsOfJoin):
  * left rows paired with the latest right row per key at or before
  * the left timestamp. Injects the planner strategy into the session
  * on first use, so it works on any SparkSession. */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, what: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$what column '$n' not found"))
    val (kl, tl) = (attr(lp, leftKey, "left key"), attr(lp, leftTs, "left ts"))
    val (kr, tr) = (attr(rp, rightKey, "right key"), attr(rp, rightTs, "right ts"))
    require(kl.dataType == LongType && kr.dataType == LongType,
      "as-of v1 requires LongType keys")
    Seq(tl, tr).foreach(a => require(
      a.dataType == TimestampType || a.dataType == TimestampNTZType ||
        a.dataType == LongType,
      "as-of v1 requires timestamp/long ts columns"))
    GraftBridge.ofRows(spark, AsOfJoinPlan(lp, rp, kl, tl, kr, tr))
  }
}
