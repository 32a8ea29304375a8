package graft.tools

import java.nio.file.{Files, Paths}

/** Per-query replica of graft.Verify for fast iteration: dump ONLY
  * the named queries plus an oracle_sql.json restricted to them, so
  * `tools/check.py <sfDir> <outDir>` gates just that subset.
  *
  *   tools/run.sh graft.tools.VerifyOne <sfDir> <outDir> <name>...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    require(names.nonEmpty, "usage: VerifyOne <sfDir> <outDir> <name>...")
    val unknown = names.diff(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.localBench(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.view.filterKeys(names).foreach {
      case (name, fn) =>
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      OracleJson.render(
        graft.SparkEntry.oracleSqlFor(sfDir).view.filterKeys(names).toMap))
    spark.stop()
  }
}
