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
    val (out, totals) =
      withCumSums(df, sortCols, Seq("cum" -> value), partitions)
    (out, totals("cum"))
  }

  /** Multi-value form: several inclusive prefix sums over ONE shared
    * range exchange + per-partition window pass (q_ks_test needs the
    * cumulative count of BOTH samples in the same value order — two
    * withCumSum calls would pay the range shuffle twice). Returns
    * (df + one named cum column per entry, name → total sum). */
  def withCumSums(df: DataFrame, sortCols: Seq[Column],
      values: Seq[(String, Column)], partitions: Int = 0)
      : (DataFrame, Map[String, Long]) = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val base0 = df.repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val base = values.foldLeft(base0) { case (b, (n, v)) =>
      b.withColumn(s"__v_$n", v.cast("long"))
    }.cache() // summed once (offsets), windowed once
    val aggCols = values.map { case (n, _) => sum(col(s"__v_$n")).as(n) }
    val counts = base.groupBy(col("__pid"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> values.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val totals = values.map(_._1).zipWithIndex.map { case (n, i) =>
      n -> counts.map(_._2(i)).sum
    }.toMap
    // exclusive per-partition offsets, one column per value
    val offRows = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(values.map(_ => 0L)) { (acc, cs) =>
        acc.zip(cs).map { case (a, c) => a + c }
      }.dropRight(1))
    val offDf = broadcast(df.sparkSession.createDataFrame(
      offRows.map { case (pid, offs) => (pid, offs) }.toSeq)
      .toDF("__pid", "__offs"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val windowed = values.foldLeft(base) { case (b, (n, _)) =>
      b.withColumn(s"__lc_$n", sum(col(s"__v_$n")).over(w))
    }.join(offDf, "__pid")
    val out = values.zipWithIndex.foldLeft(windowed) {
      case (b, ((n, _), i)) =>
        b.withColumn(n, col(s"__lc_$n") + element_at(col("__offs"), i + 1))
    }.drop(Seq("__pid", "__offs") ++
      values.flatMap { case (n, _) => Seq(s"__v_$n", s"__lc_$n") }: _*)
    (out, totals)
  }
}
