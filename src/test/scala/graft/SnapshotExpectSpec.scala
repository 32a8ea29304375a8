package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeFs, Snapshots}

/** CHECK expectations on snapshot publish (Snapshots.publishExpect —
  * the Delta-constraint / DLT-expectation shape): fail aborts with
  * nothing written, drop counts violations away, quarantine routes
  * them to a first-class sub-log; NULL predicates are violations;
  * the per-expectation report travels inside the committed version. */
class SnapshotExpectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-expect").toString + "/t"

  private def batch(rows: Seq[(Long, String, java.lang.Long)]) = {
    import spark.implicits._
    rows.toDF("k", "s", "score")
  }

  private val exps = Seq(
    "k-positive" -> (col("k") > 0L),
    "score-known" -> col("score").isNotNull,
    "score-range" -> (col("score") >= 0L && col("score") <= 100L))

  test("fail mode: a violation aborts with nothing written at all") {
    val root = tmp()
    val bad = batch(Seq((1L, "a", 50L), (-2L, "b", 50L)))
    val e = intercept[IllegalArgumentException] {
      Snapshots.publishExpect(bad, root, exps, "fail")
    }
    assert(e.getMessage.contains("k-positive=1"))
    assert(LakeFs.list(root).isEmpty, "fail mode must write nothing")

    val r = Snapshots.publishExpect(
      batch(Seq((1L, "a", 50L))), root, exps, "fail")
    assert(r.version.contains(1L) && r.violations.values.sum == 0L)
    assert(Snapshots.expectReport(root, 1L) ==
      Map("k-positive" -> 0L, "score-known" -> 0L, "score-range" -> 0L))
  }

  test("drop mode: passing rows publish, violations are counted") {
    import spark.implicits._
    val root = tmp()
    val r = Snapshots.publishExpect(
      batch(Seq((1L, "a", 50L), (-2L, "b", 50L), (3L, "c", 777L))),
      root, exps, "drop")
    assert(r.version.contains(1L))
    assert(r.violations ==
      Map("k-positive" -> 1L, "score-known" -> 0L, "score-range" -> 1L))
    assert(r.quarantineVersion.isEmpty)
    val got = Snapshots.readLog(spark, root).select("k").as[Long]
      .collect().toSet
    assert(got == Set(1L))
    assert(Snapshots.expectReport(root, 1L) == r.violations)
  }

  test("quarantine mode: violations land tagged in the sub-log, " +
      "which is itself a snapshot table") {
    import spark.implicits._
    val root = tmp()
    val r = Snapshots.publishExpect(
      batch(Seq((1L, "a", 50L), (-2L, "b", 200L), (3L, "c", 60L))),
      root, exps, "quarantine")
    assert(r.version.contains(1L) && r.quarantineVersion.contains(1L))
    val main = Snapshots.readLog(spark, root).select("k").as[Long]
      .collect().toSet
    assert(main == Set(1L, 3L))
    val q = Snapshots.readLog(spark, s"$root/_quarantine")
      .select("k", "_violated").as[(Long, String)].collect().toMap
    // the double violation carries BOTH names, comma-joined
    assert(q == Map(-2L -> "k-positive,score-range"))
    // quarantine versions stack like any other log
    val r2 = Snapshots.publishExpect(
      batch(Seq((4L, "d", -5L))), root, exps, "quarantine")
    assert(r2.version.isEmpty, "all rows violated — no main version")
    assert(r2.quarantineVersion.contains(2L))
    assert(Snapshots.readLog(spark, s"$root/_quarantine").count() == 2L)
    // and the _quarantine sub-log is invisible to the main root's
    // version listing
    assert(Snapshots.readLog(spark, root).count() == 2L)
  }

  test("streaming expectIngest: per-batch gating, replay-safe") {
    import spark.implicits._
    val root = tmp()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamOps.expectIngest(spark,
      ms.toDF().toDF("k", "s", "score"), root, exps, "spec")
    try {
      ms.addData((1L, "a", 50L), (-2L, "b", 50L)); q.processAllAvailable()
      ms.addData((3L, "c", 900L)); q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.readLog(spark, root).select("k").as[Long]
      .collect().toSet == Set(1L))
    val quar = Snapshots.readLog(spark, s"$root/_quarantine")
      .select("k", "_violated").as[(Long, String)].collect().toMap
    assert(quar == Map(-2L -> "k-positive", 3L -> "score-range"))
    // replaying an epoch is a no-op (the epochOnceFor guard)
    graft.operators.IndexLifecycle.epochOnceFor(root, "spec", 0L) {
      fail("epoch 0 must not re-run")
    }
  }

  test("NULL predicate is a violation, not a pass") {
    import spark.implicits._
    val root = tmp()
    val r = Snapshots.publishExpect(
      batch(Seq((1L, "a", null), (2L, "b", 10L))), root, exps, "drop")
    // null score violates BOTH score expectations (cannot evaluate
    // the range predicate either)
    assert(r.violations ==
      Map("k-positive" -> 0L, "score-known" -> 1L, "score-range" -> 1L))
    assert(Snapshots.readLog(spark, root).select("k").as[Long]
      .collect().toSet == Set(2L))
  }
}
