package graft.tools
object ListNames {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keySet.toSeq.sorted.foreach(println)
}
