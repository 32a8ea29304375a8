package graft.tools

import org.apache.spark.sql.functions._

/** r17 throwaway probe: stage decomposition of pipeline_e2e — times
  * each composed stage to the noop sink in the same shared-shingle
  * shape the query uses. Not part of any query path.
  *
  *   tools/run.sh graft.tools.PipeProbe /root/testdata/sf0.1
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000).selectExpr("sum(id)").collect()
    val sc = s.sparkContext
    def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs(); val t0 = System.nanoTime()
      val r = f
      println(f"[pipeprobe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs() - j0}%3d jobs")
      r
    }
    for (p <- 1 to 2) {
      println(s"--- pass $p")
      val shFull = time("shFull build+cache") {
        val sh = graft.queries.Dedup.hashedShinglesOf(
          graft.sources.Tables.documents(s, dir)).cache()
        sh.count(); sh
      }
      time("corpus_clean (standalone)")(
        graft.SparkEntry.queries("corpus_clean")(s, dir)
          .write.format("noop").mode("overwrite").save())
      time("corpus_split_safe (stand.)")(
        graft.SparkEntry.queries("corpus_split_safe")(s, dir)
          .write.format("noop").mode("overwrite").save())
      time("wordpieceApply")(
        graft.queries.Text.wordpieceApply.run(s, dir)
          .write.format("noop").mode("overwrite").save())
      time("full pipeline_e2e")(
        graft.SparkEntry.queries("pipeline_e2e")(s, dir)
          .write.format("noop").mode("overwrite").save())
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
