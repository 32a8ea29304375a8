package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** One-fresh-JVM isolation probe for the dedup_clusters pass-1
  * excursion (BENCH_r10: q1 37.07 s vs q2 6.49 s; the cold number
  * sits at the round-4 PRE-FIX plan cost of 38.5 s, so "JVM noise"
  * is not an acceptable adjudication without a plan witness).
  *
  * Protocol: warm up exactly like Bench (range-sum + entry), then run
  * dedup_clusters four times in this one JVM with Bench's inter-query
  * hygiene (clearCache + GC). A QueryExecutionListener records every
  * action's wall time and, for actions slower than 1 s, the physical
  * plan — so if pass 1 intermittently runs a different (bad) plan
  * than pass 2, the artifact shows WHICH join changed, not just that
  * time was lost. Output: per-pass times on stdout; slow-action plans
  * under /tmp/graft_clusters_probe/pass<i>-<k>.txt.
  */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localBench(cpus)
    val outDir = new java.io.File("/tmp/graft_clusters_probe")
    outDir.mkdirs()
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        recs.add((durationNs, qe.executedPlan.toString))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    spark.range(10000000L).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    (1 to 4).foreach { i =>
      recs.clear()
      val t0 = System.nanoTime()
      graft.queries.Dedup.clusters.run(spark, sfDir).count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      // drain AFTER the listener bus catches up
      Thread.sleep(2000)
      val actions = recs.toArray(Array.empty[(Long, String)])
        .sortBy(-_._1)
      println(f"pass $i: $elapsed%.2f s, ${actions.length} actions, " +
        "slowest: " + actions.take(5).map(a => f"${a._1 / 1e9}%.2f").mkString(", "))
      actions.takeWhile(_._1 > 1000000000L).zipWithIndex.foreach {
        case ((ns, plan), k) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/pass$i-$k.txt"),
            f"action $k: ${ns / 1e9}%.2f s\n$plan\n")
      }
    }
    spark.stop()
  }
}
