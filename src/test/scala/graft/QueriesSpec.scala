package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered operator runs at sf0.001 and the ones that
  * must produce rows do. The value-level gate is the DuckDB oracle
  * (tools/check.py, driver t2); this keeps `sbt test` catching
  * regressions in every query including the rows-only ones. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // operators whose result can legitimately be small/empty at tiny SF
  private val mayBeEmpty = Set("dedup_embedding")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
