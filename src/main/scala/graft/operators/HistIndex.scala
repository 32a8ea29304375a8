package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable grid-histogram index — the lake-maintained quantile
  * sketch: counts over a FIXED bucket grid (bucket = value div
  * width), appended one committed version per ingest batch and
  * merged by SUM at read. Exactness contract: quantiles computed
  * from the merged histogram are EXACT on the declared grid (the
  * smallest bucket whose cumulative count covers the rank, decided
  * by the integer cross-compare 100·cum ≥ p·n — no interpolation,
  * no float), and the structure is trivially mergeable/commutative
  * (bucket counts sum), which is what makes it maintainable as an
  * append log: O(batch) per ingest, never a rebuild — the
  * ShingleIndex lifecycle discipline applied to a sketch. The index
  * size is VALUE-DOMAIN-bounded (buckets, not rows), so reads
  * broadcast at any corpus size. */
object HistIndex {

  /** Bucket counts of `values` (a single `v: BIGINT` column). */
  def bucketCounts(values: DataFrame, width: Long): DataFrame = {
    require(width > 0, s"HistIndex: width must be > 0, got $width")
    values.select(expr(s"v div $width").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Append one batch's counts as a committed version. */
  def append(s: SparkSession, values: DataFrame, width: Long,
      root: String): Unit =
    Snapshots.publishAppend(bucketCounts(values, width), root)

  /** The merged histogram: SUM of every committed version's counts. */
  def merged(s: SparkSession, root: String): DataFrame =
    Snapshots.readLog(s, root)
      .groupBy(col("bucket")).agg(sum(col("c")).as("c"))

  /** Exact grid quantiles from the merged histogram: for each p in
    * `ps` (percent, 1..100), the smallest bucket whose cumulative
    * count reaches rank ⌈p·n/100⌉ — the integer compare 100·cum ≥
    * p·n (cum·100 ≤ 100·2^53-ish; n ≤ 9.2e16 before the cross
    * product wraps — disclosed). Returns (p, bucket, lo, n) with
    * lo = bucket·width, the bucket's inclusive lower value bound. */
  def quantiles(s: SparkSession, root: String, width: Long,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"HistIndex.quantiles: percents must be in 1..100, got $ps")
    val m = merged(s, root)
    // bounded band: the bucket grid is value-domain-sized
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = m.select(col("bucket"), sum(col("c")).over(w).as("cum"))
    val tot = m.agg(sum(col("c")).as("n"))
    val grid = cum.crossJoin(broadcast(tot))
    // ONE pass for every requested rank (conditional mins), melted
    // to rows afterwards on the 1-row aggregate
    val aggs = ps.map(p =>
      min(when(col("cum") * 100 >= col("n") * p, col("bucket")))
        .as(s"b_$p")) :+ max(col("n")).as("n")
    val row = grid.agg(aggs.head, aggs.tail: _*)
    ps.map(p => row.select(lit(p).as("p"), col(s"b_$p").as("bucket"),
        (col(s"b_$p") * width).as("lo"), col("n")))
      .reduce(_.unionByName(_)).orderBy(col("p"))
  }

  /** Per-(arm, bucket) batch stats for the winsorized-metric monitor:
    * bucket counts AND the exact in-bucket value sums, keyed by the
    * experiment arm. Input contract: columns arm (BIGINT), y (BIGINT,
    * non-negative). Same mergeability as [[bucketCounts]]: (c, sy)
    * sum across versions, so the log appends O(batch) and reads are
    * (arms × grid)-bounded. */
  def armBucketStats(rows: DataFrame, width: Long): DataFrame = {
    require(width > 0, s"HistIndex: width must be > 0, got $width")
    rows.select(col("arm"), expr(s"y div $width").as("bucket"), col("y"))
      .groupBy(col("arm"), col("bucket"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("sy"))
  }

  /** GRID-winsorized per-arm means from the merged (arm, bucket,
    * c, sy) log — q_winsor_mean's robust metric maintained as a
    * sketch: per arm, b99 = the smallest bucket whose cumulative
    * count covers rank ⌈pct·n/100⌉ (the same integer cross-compare
    * as [[quantiles]]), and the winsorized mean caps every value in
    * buckets ≥ b99 at the bucket's LOWER bound lo99 = b99·width —
    * sub-bucket values keep their EXACT sums (sy), so the result is
    * exact GIVEN the declared grid (the HistIndex contract: grid
    * precision, zero interpolation, mergeable state). Returns one
    * row per arm: (arm, n, b99, lo99, win_mean ROUND(6)). */
  def winsorMeans(s: SparkSession, root: String, width: Long,
      pct: Int = 99): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in 1..100, got $pct")
    val m = Snapshots.readLog(s, root)
      .groupBy(col("arm"), col("bucket"))
      .agg(sum(col("c")).as("c"), sum(col("sy")).as("sy"))
    // bounded band: arms × value-domain buckets
    val w = Window.partitionBy(col("arm")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = m.select(col("arm"), col("bucket"), col("c"), col("sy"),
      sum(col("c")).over(w).as("cum"))
    val tot = m.groupBy(col("arm")).agg(sum(col("c")).as("n"))
    val g = cum.join(broadcast(tot), "arm")
    val b99 = g.filter(col("cum") * 100 >= col("n") * pct)
      .groupBy(col("arm")).agg(min(col("bucket")).as("b99"))
    g.join(broadcast(b99), "arm")
      .groupBy(col("arm"))
      .agg(max(col("n")).as("n"), max(col("b99")).as("b99"),
        coalesce(sum(when(col("bucket") < col("b99"), col("sy"))),
          lit(0L)).as("s_low"),
        coalesce(sum(when(col("bucket") < col("b99"), col("c"))),
          lit(0L)).as("c_low"))
      .select(col("arm"), col("n"), col("b99"),
        (col("b99") * width).as("lo99"),
        (round((col("s_low")
          + (col("n") - col("c_low")) * col("b99") * width)
          .cast("double") / col("n"), 6) + 0).as("win_mean"))
      .orderBy(col("arm"))
  }
}
