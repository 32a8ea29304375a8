package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  val sf: String = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.build("local[4]", 8)
}
