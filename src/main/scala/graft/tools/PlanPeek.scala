package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `tools/run.sh graft.tools.PlanPeek <query> <sfDir>`
  * prints the executed plan of one registered query — the manual
  * .explain loop the build uses while tuning plan shapes. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val df = graft.SparkEntry.queries(name)(s, dir)
    println(df.queryExecution.executedPlan.toString)
  }
}
