package graft.tools

/** r17 throwaway probe: stage decomposition of sink_snapshot_optimize
  * (VERDICT r16 #7) — times the 4-append setup, the OPTIMIZE ZORDER
  * rewrite, and the pruned read separately, with per-stage Spark job
  * counts so the "compaction = one read + one write per bin" claim is
  * checkable. Not part of any query path.
  *
  *   tools/run.sh graft.tools.SinkProbe /root/testdata/sf0.1
  */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    s.range(1000000).selectExpr("sum(id)").collect()

    val sc = s.sparkContext
    def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
    def time(label: String)(f: => Unit): Unit = {
      val j0 = jobs(); val t0 = System.nanoTime()
      f
      println(f"[sinkprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs() - j0}%3d jobs")
    }

    for (p <- 1 to 2) {
      println(s"--- pass $p")
      val root = s"/tmp/graft_sinks/sinkprobe/lineitem_snap_opt"
      graft.operators.LakeFs.rmTree(root)
      val src = graft.sources.Tables.lineitem(s, dir)
      time("4x publishAppend") {
        (0 until 4).foreach { b =>
          graft.operators.Snapshots.publishAppend(
            src.filter(pmod(col("l_orderkey"), lit(4)) === b)
              .select(col("l_partkey"), col("l_suppkey"),
                col("l_returnflag"), col("l_quantity")), root)
        }
      }
      time("optimize (zorder rewrite)") {
        graft.operators.Snapshots.optimize(s, root, "l_partkey", "l_suppkey")
      }
      time("readPruned + agg") {
        graft.operators.Snapshots
          .readPruned(s, root, "l_partkey", 100L, 300L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("part_sum"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("qty"))
          .orderBy(col("l_returnflag"))
          .write.format("noop").mode("overwrite").save()
      }
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
