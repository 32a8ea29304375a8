package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Every operator in the engine, one entry per SURVEY §2 row. */
  private def registry: Seq[Q] =
    Core.all ++ Events.all ++ Text.all ++ Dedup.all ++ Vectors.all ++
      Retrieval.all ++ Multimodal.all ++ Sinks.all ++ Pipeline.all ++
      Linkage.all ++ Geo.all ++ Catalog.all ++ Graph.all ++ Quality.all ++
      Stats.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The frozen-sidecar oracles (knn_ivf, knn_pq, embed_pca) read
    * model parameters the Spark query persisted under a
    * per-sfDir /tmp path; their SQL embeds Vectors.SfToken where the
    * sanitized dir goes. This default map renders for sf0.01 — the
    * scale the driver's gate runs at — while Verify renders
    * oracleSqlFor(sfDir) so the gate works at any scale factor. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  /** The oracle map with sidecar paths rendered for `sfDir`. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql =>
      q.name -> sql.replace(Vectors.SfToken, Vectors.sanitizeDir(sfDir)))).toMap
}
