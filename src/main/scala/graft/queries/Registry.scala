package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator entry: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the
  * same parquet tables. Non-SQL-expressible operators omit the oracle
  * and are covered by ScalaTest specs instead. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
