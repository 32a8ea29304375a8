package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Deterministic ORDER slice of an existing sfDir — SliceDocs'
  * protocol for the co-purchase-graph family (r16): the
  * triangle-wedge oracles (q_triangles, graph_clustering) replay the
  * degree-ordered wedge join in DuckDB, whose materialization
  * exceeds the oracle spill budget at sf1 (witnessed: 78 GB
  * /tmp exhausted), so the full-corpus sf1 gate can only adjudicate
  * them. Slicing BOTH orders and lineitem to `orderkey % mod == 0`
  * at the data level keeps the gate restriction identical by
  * construction and fits the budget, while preserving the graph's
  * sf1 STRUCTURE where it matters: an edge is two parts in one
  * BASKET, and a basket either survives whole or drops whole — so
  * basket sizes, per-basket pair fan-out, and the part-degree skew
  * shape are sf1's, only the edge multiplicity thins (~1/mod).
  *
  *   tools/run.sh graft.tools.SliceOrders /tmp/graft_sf1 /tmp/graft_sf1_o4 4
  *
  * All other tables copy byte-identical (the graph queries read only
  * lineitem, but Verify's table views want the full set). */
object SliceOrders {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mod = args.lift(2).map(_.toInt).getOrElse(4)
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    val s = graft.GraftSession.localBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings")) {
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      require(java.nio.file.Files.isRegularFile(from),
        s"$from is not a single-file parquet table")
      java.nio.file.Files.copy(from,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    for ((t, key) <- Seq("orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey")) {
      val sliced = s.read.parquet(s"$src/$t.parquet")
        .filter(col(key) % mod === 0)
      val tmp = s"$out/_tmp_$t"
      sliced.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.operators.LakeFs.rmTree(tmp)
      println(s"sliced $t % $mod: ${sliced.count()} rows -> $out")
    }
    s.stop()
  }
}
