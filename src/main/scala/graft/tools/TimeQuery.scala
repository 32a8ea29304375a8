package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeQuery <sfDir> <name>... */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Bench-identical session (AQE, extensions, shuffle width) so
    // timings here predict BENCH_r{N} — a plain builder session
    // diverged 3x on AQE-sensitive plans.
    val spark = graft.GraftSession.localBench(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      // Bench inter-query hygiene is the DEFAULT (timings here claim
      // to predict BENCH_r{N}); set GRAFT_KEEPCACHE to study warm runs
      if (!sys.env.contains("GRAFT_KEEPCACHE")) {
        spark.catalog.clearCache(); System.gc()
      }
    }
    spark.stop()
  }
}
