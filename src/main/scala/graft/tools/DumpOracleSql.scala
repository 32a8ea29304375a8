package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT starting Spark or
  * running any query — feeds `tools/check.py --lint`, the oracle
  * result-typing lint (round-5 lesson: two oracles returned DuckDB HUGEINT
  * columns and the driver's type-sensitive hash flagged bit-identical
  * results as red). Usage: tools/run.sh graft.tools.DumpOracleSql <outFile>
  */
object OracleJson {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}

object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    // optional 2nd arg: the sfDir the sidecar oracle paths render for
    // (default = sf0.01, the driver gate's scale — same as
    // SparkEntry.oracleSql)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val oracle = graft.SparkEntry.oracleSqlFor(sfDir)
    Files.writeString(Paths.get(out), OracleJson.render(oracle))
    println(s"wrote ${oracle.size} oracles to $out")
  }
}
