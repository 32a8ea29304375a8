package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained lake state for substring-level exact dedup (the
  * queries.Dedup substring family) — the same build/append/read
  * lifecycle IvfIndex gives the vector side, applied to the rolling
  * window fingerprints of Lee et al. '22 substring dedup.
  *
  * Layout under `indexDir`:
  *   windows/  (doc_id, pos, fp), partitioned by fp_b = pmod(fp, 16) —
  *             every window position whose fingerprint was
  *             at-or-under the df cap when its batch arrived
  *   stop/     (fp) — fingerprints whose BUILD-time document
  *             frequency exceeded the cap (ultra-common boilerplate);
  *             their positions are never stored
  *
  * Why df=1 windows are stored: a window unique at build time is
  * promoted to a duplicate the moment one future batch re-emits it —
  * dropping it would make the index blind to every dup whose first
  * copy predates the index. The index is therefore ~1 row per corpus
  * token, 24 bytes each — the same size class as the suffix array the
  * paper builds over the corpus, and the price of exactness. The stop
  * list is what keeps the PAIR JOIN off boilerplate: positions for
  * over-cap fingerprints would dominate storage AND candidate fan-out,
  * and can never re-qualify (document frequency only grows).
  *
  * Append is O(batch): the batch's windows are gated against the
  * bounded stop list and appended; no index rewrite, no df
  * re-aggregation. Document frequencies are derived AT READ, restricted
  * to the fingerprints the reading batch actually touches (see
  * queries.Dedup.substringIncremental) — the log-structured trade:
  * writes stay append-only, the read pays one batch-restricted
  * aggregation over the narrow (fp, doc_id) columns. A fingerprint
  * that climbs over the cap through appends is excluded by that read
  * filter; its stored positions become dead weight until compaction
  * (sink_compaction is the operator for exactly that).
  */
object SubstringIndex {

  private def withBucket(w: DataFrame): DataFrame =
    w.withColumn("fp_b", pmod(col("fp"), lit(16)).cast("int"))

  /** Batch-build from the full window set of the index corpus:
    * splits over-cap fingerprints to stop/, lays the rest out
    * partitioned by fp bucket. */
  def build(windows: DataFrame, indexDir: String, maxDf: Int): Unit = {
    val df = windows.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
    df.filter(col("df") > maxDf).select(col("fp"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stop")
    withBucket(windows.join(df.filter(col("df") <= maxDf)
        .select(col("fp")), "fp"))
      .repartition(col("fp_b"))
      .write.mode(SaveMode.Overwrite).partitionBy("fp_b")
      .parquet(s"$indexDir/windows")
  }

  /** Incremental append: gate the new batch's windows against the
    * frozen stop list, add them to the partitioned layout. Mirrors
    * IvfIndex.append — no refit/rewrite of existing state. */
  def append(spark: SparkSession, batchWindows: DataFrame,
      indexDir: String): Unit =
    withBucket(batchWindows
        .join(spark.read.parquet(s"$indexDir/stop"), Seq("fp"), "left_anti"))
      .repartition(col("fp_b"))
      .write.mode(SaveMode.Append).partitionBy("fp_b")
      .parquet(s"$indexDir/windows")

  /** The maintained window table (doc_id, pos, fp). */
  def windows(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/windows")
      .select(col("doc_id"), col("pos"), col("fp"))

  /** Offline compaction — the sink_compaction shape applied to index
    * state. Appends only ever ADD rows, so a fingerprint whose
    * document frequency climbs over the cap through appends keeps its
    * stored positions as dead weight: the read path's df filter
    * excludes them from every result, but every read still scans and
    * aggregates them. This pass re-aggregates df over the full
    * appended state, PROMOTES over-cap fingerprints to stop/ (document
    * frequency only grows — they can never re-qualify), drops their
    * positions, and rewrites the bucket partitions (also folding the
    * many small per-append files back into one layout pass).
    *
    * Reads are equivalent before/after by construction: the dropped
    * positions are exactly those the read-side `df <= maxDf` filter
    * already excluded, and the grown stop list only gates fps whose
    * windows no longer exist. Publish follows the IndexLifecycle
    * scheme — build aside, atomic rename swap — so a concurrent
    * reader never sees a half-rewritten tree; the freshness marker
    * (if present) is carried over unchanged, because compaction
    * changes the layout, not the logical content. */
  def compact(spark: SparkSession, indexDir: String, maxDf: Int): Unit = {
    val w = windows(spark, indexDir).cache()
    // cached: the tiny over-cap fp list feeds BOTH writes below —
    // uncached, the corpus-token-scale countDistinct would run twice
    val over = w.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
      .cache()
    IndexLifecycle.republish(indexDir) { tmp =>
      spark.read.parquet(s"$indexDir/stop").select(col("fp"))
        .union(over).distinct()
        .coalesce(1).write.parquet(tmp + "/stop")
      withBucket(w.join(over, Seq("fp"), "left_anti"))
        .repartition(col("fp_b"))
        .write.partitionBy("fp_b").parquet(tmp + "/windows")
    }
    over.unpersist()
    w.unpersist()
  }
}
