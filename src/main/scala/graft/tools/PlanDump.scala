package graft.tools

import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` of named registered queries to
  * files — the r16 optimization-round plan evidence
  * (`plans/r16/<query>_<suffix>.txt`). Bench-identical session so
  * the captured plan is the one the bench times.
  *
  *   tools/run.sh graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    require(names.nonEmpty,
      "usage: PlanDump <sfDir> <outDir> <suffix> <name>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localBench(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // queryExecution.explainString = what .explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      spark.catalog.clearCache()
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
