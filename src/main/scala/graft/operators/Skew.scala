package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join split handles most hot-key cases at runtime
  * (enabled by GraftSession); these are the explicit forms for when a
  * key is so hot that even one split is wrong — e.g. a single
  * boilerplate document duplicated millions of times in a 100 TB
  * crawl.
  */
object Skew {

  /** Two-phase (salted) aggregation: count per key without any single
    * reducer seeing a hot key's full stream. Phase 1 groups on
    * (key, salt) — map-side combine still applies — phase 2 sums the
    * partials per key. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(spark_partition_id(), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n"))

  /** Salted broadcast-side replication join: left side gets a random
    * salt in [0, n), the (small) right side is exploded n ways, and
    * the join key becomes (key, salt) — spreading a hot left key over
    * n reducers. Right must be small enough to replicate n times. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(pmod(hash(monotonically_increasing_id()), lit(saltBuckets))
        + lit(saltBuckets), lit(saltBuckets)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey)
        && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
