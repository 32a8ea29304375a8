package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("executes through the custom AsOfJoinExec node") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("rk", "rt", "v")
    val j = AsOf.join(l, r, "k", "t", "rk", "rt")
    // physical node renders without the Exec suffix
    assert(j.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("picks the latest right row at-or-before; null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L), (1L, 200L), (1L, 50L), // key 1 at various times
      (2L, 100L),                        // key 2: right rows exist, all later
      (3L, 100L)                         // key 3: no right rows at all
    ).toDF("k", "t")
    val right = Seq(
      (1L, 60L, "a"), (1L, 100L, "b"), (1L, 150L, "c"), // key 1
      (2L, 500L, "z")                                   // key 2, too late
    ).toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("k"), col("t"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got == Set(
      (1L, 50L, null),  // before any right row
      (1L, 100L, "b"),  // exact-timestamp tie is included
      (1L, 200L, "c"),
      (2L, 100L, null),
      (3L, 100L, null)))
  }

  test("matches the compositional as-of on real data") {
    val sf = TestSpark.sf
    // the composed form's union coerces to TimestampType while the
    // native node keeps TimestampNTZ — normalize before comparing
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("last_orderdate").cast("timestamp_ntz"))
      .collect().map(_.mkString("|")).toSet
    val composed = canon(graft.queries.Events.asofJoin.run(spark, sf))
    val native = canon(graft.queries.Events.asofNative.run(spark, sf))
    assert(native == composed)
  }
}
