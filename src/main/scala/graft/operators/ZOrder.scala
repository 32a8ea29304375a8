package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered lake writes — the multi-dimension
  * data-skipping layout (Delta OPTIMIZE ZORDER / Iceberg sort-order
  * shape). A table range-partitioned and sorted by the interleaved
  * bits of two key columns puts rows that are close in BOTH
  * dimensions into the same files, so per-file min/max statistics
  * prune scans filtered on EITHER key — a hive partition layout can
  * only serve one.
  *
  * Scale shape: one stats aggregate (4 values, broadcast back — the
  * fact table never collects), one range shuffle on the z-value, and
  * a within-partition sort that also tightens parquet row-group
  * stats. That is exactly the cost of any global sort; at 100 TB it
  * is the standard nightly OPTIMIZE job, amortized across every
  * selective scan that follows. The z-value is computed by codegen'd
  * bitwise columns (shift/and/or only — no UDF).
  *
  * Content is untouched (helper columns dropped before the write), so
  * losslessness is oracle-checkable; the clustering property itself
  * is asserted by PlanSpec on per-file spans.
  */
object ZOrder {

  /** Interleave-ready 16-bit spread: the classic power-of-two magic
    * masks, x's bit i moved to bit 2i (zeros in the odd positions). */
  private def spread(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Scale a key linearly onto [0, 65535] against broadcast min/max
    * columns. Values are non-negative offsets from the min, so the
    * floor-division is exact and monotone. */
  private def norm(v: Column, lo: Column, hi: Column): Column =
    floor((v - lo).cast("double") * 65535.0 /
      greatest(lit(1.0), (hi - lo).cast("double"))).cast("long")

  /** 32-bit Morton code of two keys normalized to 16 bits each. */
  def zvalue(a: Column, b: Column, aLo: Column, aHi: Column,
      bLo: Column, bHi: Column): Column =
    spread(norm(a, aLo, aHi)).bitwiseOR(shiftleft(spread(norm(b, bLo, bHi)), 1))

  /** `df` laid out on the Morton curve of (keyA, keyB): one stats
    * aggregate broadcast back, one range shuffle on the z-value into
    * `nFiles` shards, and a within-partition sort. The schema is
    * exactly `df`'s — helper columns are dropped before the caller's
    * writer sees a row. Reused by every z-ordered writer
    * (clusteredWrite, Snapshots.optimize). */
  def clustered(df: DataFrame, keyA: String, keyB: String,
      nFiles: Int): DataFrame = {
    val stats = df.agg(
      min(col(keyA)).cast("long").as("__a_lo"),
      max(col(keyA)).cast("long").as("__a_hi"),
      min(col(keyB)).cast("long").as("__b_lo"),
      max(col(keyB)).cast("long").as("__b_hi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zvalue(
        col(keyA).cast("long"), col(keyB).cast("long"),
        col("__a_lo"), col("__a_hi"), col("__b_lo"), col("__b_hi")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__a_lo", "__a_hi", "__b_lo", "__b_hi")
  }

  /** Write `df` to `path` as `nFiles` z-ordered parquet files keyed on
    * (keyA, keyB). The written schema is exactly `df`'s — helper
    * columns never land on disk. */
  def clusteredWrite(df: DataFrame, keyA: String, keyB: String,
      path: String, nFiles: Int): Unit =
    clustered(df, keyA, keyB, nFiles)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
