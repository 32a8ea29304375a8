package graft.tools

import org.apache.spark.sql.functions._

/** A/B of the graftsnap scan's decode paths (row record-assembly vs
  * vectorized columnar, r14): publish lineitem as a two-version log,
  * then time an aggregate over a full-width read under each setting
  * of the `graft.columnar` system property — same JVM, alternating
  * passes so JIT warmth cannot favor one side.
  *
  *   tools/run.sh graft.tools.ColumnarProbe [sfDir] [passes]
  */
object ColumnarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    val root = "/tmp/graft_columnar_probe/" +
      graft.queries.Vectors.sanitizeDir(sfDir)
    graft.operators.LakeFs.rmTree(root)
    val li = graft.sources.Tables.lineitem(s, sfDir)
      .withColumn("l_quantity", col("l_quantity").cast("long"))
    graft.operators.Snapshots.publishAppend(
      li.filter(col("l_orderkey") % 2 === 0), root)
    graft.operators.Snapshots.publishAppend(
      li.filter(col("l_orderkey") % 2 === 1), root)

    def scan(): Unit = {
      // full-width decode + a narrow aggregate: the decode dominates
      s.read.format("graftsnap").load(root)
        .filter(col("l_linenumber") >= 1)
        .selectExpr("sum(l_orderkey)", "sum(l_quantity)",
          "sum(length(l_returnflag))", "max(l_shipdate)",
          "sum(l_partkey)", "sum(l_suppkey)", "sum(l_extendedprice)")
        .collect()
      ()
    }
    def time(columnar: Boolean): Double = {
      System.setProperty("graft.columnar", columnar.toString)
      val t0 = System.nanoTime()
      scan()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm-up per side, then alternating timed passes
    time(columnar = true); time(columnar = false)
    val (cs, rs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to passes).foreach { _ =>
      cs += time(columnar = true)
      rs += time(columnar = false)
    }
    System.clearProperty("graft.columnar")
    def fmt(a: Array[Double]) =
      a.map(v => f"$v%.2f").mkString("[", ",", "]")
    val (c, r) = (cs.result(), rs.result())
    println(f"""{"probe":"graftsnap_columnar","sf":"$sfDir","columnar_sec":${fmt(c)},"row_sec":${fmt(r)},"speedup_median":${r.sorted.apply(r.length / 2) / c.sorted.apply(c.length / 2)}%.2f}""")
    s.stop()
  }
}
