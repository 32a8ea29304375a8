package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions are usable from plain SQL once
  * graft.GraftExtensions is active (TestSpark builds through
  * GraftSession, which sets spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("poly_window_hashes from SQL matches the per-window fold") {
    val r = spark.sql(
      "SELECT poly_window_hashes(array(7L, 11L, 13L, 17L), 2, 40) AS h")
      .collect().head.getSeq[Long](0)
    val B = graft.functions.PolyWindowHashes.Base
    val M = 1L << 40
    assert(r == Seq(7L, 11L, 13L).zip(Seq(11L, 13L, 17L))
      .map { case (a, b) => ((a * B) % M + b) % M })
  }

  test("graft_dot from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("topk_by from SQL matches window top-k") {
    spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .createOrReplaceTempView("orders_v")
    val viaAgg = spark.sql(
      """SELECT o_custkey, e.id AS o_orderkey
        |FROM (SELECT o_custkey, topk_by(o_totalprice, o_orderkey, 3) t
        |      FROM orders_v GROUP BY o_custkey)
        |LATERAL VIEW explode(t) AS e""".stripMargin)
      .collect().map(_.mkString("|")).toSet
    val viaWindow = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders_v) WHERE rn <= 3""".stripMargin)
      .collect().map(_.mkString("|")).toSet
    assert(viaAgg == viaWindow)
  }

  test("gramian from SQL: count, sums, and outer products") {
    val g = spark.sql(
      """SELECT gramian(v, 2) AS g FROM (
        |  SELECT array(1.0D, 2.0D) v UNION ALL SELECT array(3.0D, 4.0D))""".stripMargin)
      .collect().head.getSeq[Double](0)
    // layout: [n, Σx0, Σx1, Σx0x0, Σx0x1, Σx1x0, Σx1x1]
    assert(g == Seq(2.0, 4.0, 6.0, 10.0, 14.0, 14.0, 20.0))
  }

  test("gramian rejects non-double arrays at analysis time") {
    // array<int> / array<float> must fail analysis, not reinterpret
    // the unsafe buffer at the wrong width mid-job
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT gramian(array(1, 2), 2) FROM (SELECT 1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("gramian"))
  }

  test("gramian skips corrupt rows: null elements, null rows, wrong width") {
    val g = spark.sql(
      """SELECT gramian(v, 2) AS g FROM (
        |  SELECT array(1.0D, 2.0D) v
        |  UNION ALL SELECT array(3.0D, CAST(NULL AS DOUBLE))
        |  UNION ALL SELECT CAST(NULL AS ARRAY<DOUBLE>)
        |  UNION ALL SELECT array(5.0D))""".stripMargin)
      .collect().head.getSeq[Double](0)
    // only the clean row contributes — a null ELEMENT must not fold
    // in as 0.0 with n incremented (it would skew every moment)
    assert(g == Seq(1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 4.0))
  }

  test("simhash64 and minhash_sketch from SQL") {
    val r = spark.sql(
      """SELECT simhash64(xxhash64(t), 1L) AS sh,
        |  minhash_sketch(xxhash64(t), 8) AS mh
        |FROM (SELECT explode(array('a','b','c')) t)""".stripMargin)
      .collect().head
    assert(r.getSeq[Long](1).length == 8)
    // deterministic across invocations
    val r2 = spark.sql(
      """SELECT simhash64(xxhash64(t), 1L) AS sh
        |FROM (SELECT explode(array('a','b','c')) t)""".stripMargin)
      .collect().head
    assert(r.getLong(0) == r2.getLong(0))
  }
}
