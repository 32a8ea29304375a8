package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single place for loading the star-schema + document/vector tables.
  *
  * Mirrors the reference's document-ingestion entry point
  * (conversadocs/bones.py:47 `load_db`): where the reference walks a
  * file list on one machine, Graft reads a parquet lake — the loader
  * registry there maps to Spark `DataFrameReader` formats here
  * (parquet today; csv/json/orc/text are the same one-line call).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table carries a TIMESTAMP(NANOS) parquet column, which
    * Spark 4 rejects by default. Read nanos as long and convert to a
    * micros timestamp (the generator wrote whole-micro values, so this
    * is lossless and matches DuckDB's micros truncation). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
