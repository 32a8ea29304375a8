package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing: pre-shuffling fact tables into hash buckets on the join
  * key removes the exchange from every subsequent join — at 100 TB,
  * bucketed layout is how repeated join/agg pipelines avoid
  * re-shuffling the lake each run. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed join runs without a shuffle exchange") {
    // the in-memory catalog is per-JVM; stale table dirs from earlier
    // runs must go or saveAsTable refuses the location
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    rmTree(java.nio.file.Paths.get("/tmp/graft_warehouse/b_orders"))
    rmTree(java.nio.file.Paths.get("/tmp/graft_warehouse/b_lineitem"))
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"))
      // the join keys must not be re-shuffled (the group-by agg's own
      // exchange on o_orderpriority is expected)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"))
      // and it computes the right thing
      val n = joined.collect().map(_.getLong(1)).sum
      assert(n == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approx distinct within 5% of exact") {
    val rows = graft.queries.Core.qApproxDistinct.run(spark, sf).collect()
    // the query's own flag (what the oracle hash-checks)...
    rows.foreach(r =>
      assert(r.getBoolean(r.fieldIndex("approx_ok")), s"HLL bound: $r"))
    // ...and the raw estimate, rebuilt, against the exact counts
    val est = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ex = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(est(r.getString(0)) - ex) / ex <= 0.05,
        s"${r.getString(0)}: ${est(r.getString(0))} vs $ex")
    }
  }
}
