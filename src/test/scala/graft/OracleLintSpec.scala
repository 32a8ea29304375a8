package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wires `tools/check.py --lint` — the DuckDB oracle result-TYPING
  * lint — into `sbt test`, so a disallowed oracle result type (the
  * round-5 lesson: an uncast SUM(BIGINT) promotes to HUGEINT and reds
  * the driver's type-sensitive hash even on bit-identical values)
  * fails the build locally instead of the driver round. Cancels
  * cleanly on boxes without python3+duckdb (the lint is a
  * driver-environment replica, not a library dependency).
  */
class OracleLintSpec extends AnyFunSuite {

  private def run(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      s => out.append(s).append('\n'), s => out.append(s).append('\n'))
    val code = scala.sys.process.Process(cmd, new java.io.File(".")).!(logger)
    (code, out.toString)
  }

  private lazy val duckdbAvailable =
    scala.util.Try(run(Seq("python3", "-c", "import duckdb"))._1 == 0)
      .getOrElse(false)

  private def lint(oracle: Map[String, String]): (Int, String) = {
    val json = java.nio.file.Files.createTempFile("oracle_lint", ".json")
    java.nio.file.Files.writeString(json,
      graft.tools.OracleJson.render(oracle))
    run(Seq("python3", "tools/check.py", "--lint", TestSpark.sf,
      json.toString))
  }

  test("every registered oracle passes the result-typing lint") {
    assume(duckdbAvailable, "python3+duckdb not available on this box")
    // render sidecar paths for the spec sfDir: if the vector suites
    // already ran in this JVM the sidecars exist and those oracles
    // lint for real; on a fresh box they SKIP instead of failing
    val (code, out) = lint(SparkEntry.oracleSqlFor(TestSpark.sf))
    assert(code == 0, s"oracle typing lint failed:\n$out")
  }

  test("rendered oracles carry no unexpanded sidecar token") {
    // the default map renders for sf0.01 and Verify renders for its
    // own sfDir — a leftover __GRAFT_SFDIR__ literal in either means
    // a sidecar oracle that can never bind
    val token = graft.queries.Vectors.SfToken
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(!sql.contains(token), s"$name: unexpanded $token")
    for ((name, sql) <- SparkEntry.oracleSqlFor("/root/testdata/sf0.1"))
      assert(!sql.contains(token), s"$name: unexpanded $token")
    // and the rendering really is per-dir
    assert(SparkEntry.oracleSqlFor("/root/testdata/sf0.1")("knn_ivf")
      .contains("_root_testdata_sf0_1"))
  }

  test("the lint reds an uncast SUM (HUGEINT result)") {
    assume(duckdbAvailable, "python3+duckdb not available on this box")
    val (code, out) = lint(Map("bad_sum" ->
      ("SELECT l_returnflag, SUM(l_quantity::BIGINT) AS s " +
        "FROM lineitem GROUP BY 1")))
    assert(code == 1, s"lint must fail a HUGEINT result column:\n$out")
    assert(out.contains("LINT-FAIL bad_sum"), out)
  }

  test("lint mode still FAILS a typo'd table name (catalog errors are not file errors)") {
    assume(duckdbAvailable, "python3+duckdb not available on this box")
    // the SKIP branch matches file-IO messages only: a DuckDB catalog
    // error ('Table ... does not exist') must stay a LINT-FAIL or a
    // broken oracle sails through the sbt gate to the driver round
    val (code, out) = lint(Map("typo_table" ->
      "SELECT * FROM documnets"))
    assert(code == 1, s"catalog error must LINT-FAIL in lint mode:\n$out")
    assert(out.contains("LINT-FAIL typo_table"), out)
  }

  test("lint mode SKIPs sidecar oracles whose inputs predate Verify") {
    assume(duckdbAvailable, "python3+duckdb not available on this box")
    val (code, out) = lint(Map("fresh_sidecar" ->
      "SELECT * FROM read_parquet('/tmp/graft_no_such_sidecar_xyz/*.parquet')"))
    assert(code == 0, s"missing sidecar must SKIP in lint mode:\n$out")
    assert(out.contains("SKIP fresh_sidecar"), out)
  }
}
