package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered operator runs at sf0.001 and the ones that
  * must produce rows do. The value-level gate is the DuckDB oracle
  * (tools/check.py, driver t2); this keeps `sbt test` catching
  * regressions in every query including the rows-only ones. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // operators whose result can legitimately be small/empty at tiny SF
  // (ann_lsh: 16-bit bands are a near-duplicate candidate generator
  // and this synthetic corpus tops out at pair cos ~0.6 — see the
  // regime note on Vectors.annLsh; VectorSpec gates the planted-dup
  // recall instead)
  private val mayBeEmpty = Set("dedup_embedding", "ann_lsh")

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

  test("count-min estimates are one-sided and tight on heavy hitters") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Text.freqSketch.run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // the query's own CMS-bound flag (what the oracle hash-checks)
    rows.foreach(r => assert(r.getBoolean(2), s"CMS bound violated: $r"))
    // tightness, beyond the eps·N guarantee: rebuild the same
    // fixed-seed sketch and compare estimates to the exact counts
    val tok = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(explode(expr("graft_tokens(text)")).as("t"))
    val cms = tok.stat.countMinSketch(col("t"), eps = 0.0001,
      confidence = 0.99, seed = 42)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = cms.estimateCount(r.getString(0))
      assert(est >= exact, "CMS never underestimates")
      assert(est <= (exact * 1.05).toLong + 100, s"CMS overshoot: $est vs $exact")
    }
  }

  test("approx quantiles land within 2% relative error of exact") {
    import org.apache.spark.sql.functions._
    // the query's own envelope flag (what the oracle hash-checks)
    graft.queries.Core.qApproxQuantiles.run(spark, TestSpark.sf)
      .collect().foreach(r =>
        assert(r.getBoolean(r.fieldIndex("approx_ok")), s"envelope: $r"))
    // tightness beyond the envelope: rebuild the sketch estimate and
    // compare to the exact median
    val exact = graft.queries.Core.qPercentiles.run(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap // p50
    val approx = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("q50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (flag, p50) =>
      val est = approx(flag)
      assert(math.abs(est - p50) / p50 < 0.02,
        s"$flag: approx p50 $est vs exact $p50")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
