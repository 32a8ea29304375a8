package graft.tools

/** Throwaway probe for the r17 optimization round: run a registered
  * query, then print its FINAL adaptive plan (post-execution) — the
  * initial AdaptiveSparkPlan explain cannot show runtime
  * exchange/stage reuse, so ReusedExchange evidence only exists
  * here. Not part of any query path.
  *
  *   tools/run.sh graft.tools.Scratch <sfDir> <query>...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("retrieval_prf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, dir)
      val t0 = System.nanoTime()
      // collect, not a noop write: the write runs its own
      // QueryExecution, leaving df's plan un-finalized (registered
      // query outputs are tiny result frames, so collect is safe
      // here — this probe is for PLAN evidence, not timing)
      df.collect()
      println(f"[scratch] $name collect ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).length
      println(s"[scratch] $name FINAL plan: isFinal=${p.contains("isFinalPlan=true")}" +
        s" scans=${c("Scan parquet")} exch=${c("Exchange")}" +
        s" reusedExch=${c("ReusedExchange")}" +
        s" shuffleStages=${c("ShuffleQueryStage")}" +
        s" bcastStages=${c("BroadcastQueryStage")}" +
        s" tableCaches=${c("TableCacheQueryStage")}")
      if (sys.env.contains("GRAFT_DUMP"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/${name}_final.txt"), p)
      s.catalog.clearCache()
    }
    s.stop()
  }
}
