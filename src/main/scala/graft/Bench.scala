package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    // Warm the JVM/codegen and the parquet footers so the first timed
    // query isn't charged for session startup.
    spark.range(10000000L).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      // capture elapsed BEFORE cache teardown: clearCache + GC belong
      // to inter-query hygiene, not to the measured query
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query caches must not leak forward; unpersist is async, so
      // nudge the JVM before the next query times itself
      spark.catalog.clearCache()
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
