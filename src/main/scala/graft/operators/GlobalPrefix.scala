package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global prefix sums.
  *
  * `sum(x) over (order by k)` with no partitionBy funnels EVERY row
  * through one task — the canonical single-partition scale-killer.
  * This helper computes the same inclusive global prefix sum in two
  * parallel passes: range-partition on the sort key, a per-partition
  * window (parallel), then one O(partitions) row set to the driver
  * for the cumulative offsets, broadcast back. Shared by q_ntile
  * (value = 1 → global rank) and token_shards (value = token count);
  * PlanSpec asserts neither plan contains an Exchange SinglePartition.
  */
object GlobalPrefix {

  /** Returns (df + `cum` column, total sum). `cum` is the inclusive
    * prefix sum of `value` (cast to long) in `sortCols` order. Runs
    * ONE action (the per-partition totals; also materializes the
    * cached base the window pass reuses).
    *
    * `partitions` <= 0 (the default) sizes the range exchange to the
    * session's `spark.sql.shuffle.partitions` — 32 locally, whatever
    * the job sized its shuffles to on a real cluster — so the prefix
    * pass scales with the deployment instead of a hardcoded width;
    * the driver-side offset set stays O(partitions) either way. */
  def withCumSum(df: DataFrame, sortCols: Seq[Column], value: Column,
      partitions: Int = 0): (DataFrame, Long) = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df.repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
      .cache() // summed once (offsets), windowed once
    val counts = base.groupBy(col("__pid")).agg(sum(col("__v")).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = base.withColumn("__lc", sum(col("__v")).over(w))
      .join(broadcast(offDf), "__pid")
      .withColumn("cum", col("__lc") + col("__off"))
      .drop("__pid", "__v", "__lc", "__off")
    (out, total)
  }
}
