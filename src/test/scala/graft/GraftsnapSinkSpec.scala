package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeFs, Snapshots}

/** The graftsnap DSv2 STREAMING sink: `df.writeStream
  * .format("graftsnap").start(root)` — each epoch one committed log
  * version through Snapshots.commitStagedEpoch. Pins: end-to-end
  * rows (including fresh-root bootstrap through
  * supportsExternalMetadata), restart continuation without loss or
  * duplication (also witnesses that the default scope — the query
  * id — is restart-stable), epoch replay idempotence, and the
  * crash window between version marker and root epoch hint (the
  * in-version `_SNAP_EPOCH_` tag closes it). */
class GraftsnapSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("streaming sink lands each batch as a committed version; " +
      "restart continues without loss or double") {
    import spark.implicits._
    val root = tmp("graftsnap-sink")
    val ckpt = Files.createTempDirectory("graftsnap-sink-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val df = ms.toDF().toDF("k", "s")
    def start() = df.writeStream
      .option("checkpointLocation", ckpt)
      .format("graftsnap")
      .start(root)

    val q1 = start()
    try {
      ms.addData(1L -> "a", 2L -> "b"); q1.processAllAvailable()
      ms.addData(3L -> "c"); q1.processAllAvailable()
    } finally q1.stop()

    val afterFirst = Snapshots.readLog(spark, root)
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(afterFirst == Set(1L -> "a", 2L -> "b", 3L -> "c"))

    // restart from the same checkpoint: the sink's default scope (the
    // query id) must be stable, so nothing replays as a new version
    val q2 = start()
    try {
      ms.addData(4L -> "d"); q2.processAllAvailable()
    } finally q2.stop()

    val afterRestart = Snapshots.readLog(spark, root)
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(afterRestart ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))

    // each non-empty epoch is one committed, time-travelable version
    val hist = Snapshots.history(spark, root)
      .filter(col("committed")).select("version").as[Long].collect().toSet
    assert(hist.size >= 2, s"expected >=2 committed versions, got $hist")
    // no staging residue below the root
    LakeFs.list(root).map(_.getPath)
      .filter(_.getName.startsWith("_stage_")).foreach { d =>
        assert(LakeFs.leaves(d.toString).isEmpty, s"staging residue in $d")
      }
  }

  test("commitStagedEpoch: replayed epoch is a no-op") {
    import spark.implicits._
    val root = tmp("graftsnap-replay")
    // bootstrap v=1 through the normal publish
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "s"), root)

    def stageOne(tag: String): (String, Seq[String]) = {
      val stage = s"$root/_stage_spec/$tag"
      val f = s"$stage/part-0-0.parquet"
      Seq((9L, tag)).toDF("k", "s").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/raw")
      val part = LakeFs.list(s"$stage/raw")
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).head
      require(LakeFs.rename(part, f))
      (stage, Seq(f))
    }

    val (st1, files1) = stageOne("e7")
    assert(Snapshots.commitStagedEpoch(root, files1, "spec", 7L, st1)
      .nonEmpty)
    val rowsAfter = Snapshots.readLog(spark, root).count()

    // replay with fresh staged files — fast path: root hint exists
    val (st2, files2) = stageOne("e7b")
    assert(Snapshots.commitStagedEpoch(root, files2, "spec", 7L, st2)
      .isEmpty)
    assert(Snapshots.readLog(spark, root).count() == rowsAfter)
    // replayed staging cleaned up
    assert(LakeFs.leaves(st2).isEmpty)
  }

  test("commitStagedEpoch: crash between version marker and hint " +
      "is detected by the in-version epoch tag") {
    import spark.implicits._
    val root = tmp("graftsnap-crash")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "s"), root)

    def stageOne(tag: String): (String, Seq[String]) = {
      val stage = s"$root/_stage_spec/$tag"
      val f = s"$stage/part-0-0.parquet"
      Seq((9L, tag)).toDF("k", "s").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/raw")
      val part = LakeFs.list(s"$stage/raw")
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).head
      require(LakeFs.rename(part, f))
      (stage, Seq(f))
    }

    val (st1, files1) = stageOne("e3")
    val v = Snapshots.commitStagedEpoch(root, files1, "spec", 3L, st1).get
    // simulate the crash: the committed version exists but the root
    // hint was never written
    LakeFs.rmFile(s"$root/_GRAFT_EPOCH_spec_3")
    assert(LakeFs.isFile(s"$root/v=$v/_SNAP_EPOCH_spec_3"))

    val rowsAfter = Snapshots.readLog(spark, root).count()
    val (st2, files2) = stageOne("e3b")
    // replay: the scan over committed versions finds the tag → no-op,
    // and the hint is re-established for the next fast path
    assert(Snapshots.commitStagedEpoch(root, files2, "spec", 3L, st2)
      .isEmpty)
    assert(Snapshots.readLog(spark, root).count() == rowsAfter)
    assert(LakeFs.isFile(s"$root/_GRAFT_EPOCH_spec_3"))

    // and a LATER epoch still publishes (the tag scan's early stop
    // at this scope's newest tag must not swallow new epochs)
    val (st3, files3) = stageOne("e4")
    assert(Snapshots.commitStagedEpoch(root, files3, "spec", 4L, st3)
      .nonEmpty)
    assert(Snapshots.readLog(spark, root).count() == rowsAfter + 1)
  }

  test("crashed-commit epoch survives compaction + vacuum: " +
      "vacuumLog promotes the in-version tag to a root hint") {
    import spark.implicits._
    val root = tmp("graftsnap-vacuum-tag")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "s"), root)

    def stageOne(tag: String): (String, Seq[String]) = {
      val stage = s"$root/_stage_spec/$tag"
      val f = s"$stage/part-0-0.parquet"
      Seq((9L, tag)).toDF("k", "s").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/raw")
      val part = LakeFs.list(s"$stage/raw")
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).head
      require(LakeFs.rename(part, f))
      (stage, Seq(f))
    }

    val (st1, files1) = stageOne("e5")
    val v = Snapshots.commitStagedEpoch(root, files1, "spec", 5L, st1).get
    // crash before the hint, then MAINTENANCE runs before restart:
    // the fold subsumes v and vacuumLog deletes its dir — the only
    // record of the epoch is the in-version tag it must promote
    LakeFs.rmFile(s"$root/_GRAFT_EPOCH_spec_5")
    Snapshots.compactLog(spark, root)
    Snapshots.vacuumLog(root)
    assert(!LakeFs.exists(s"$root/v=$v"), "raw dir should be reaped")
    assert(LakeFs.isFile(s"$root/_GRAFT_EPOCH_spec_5"),
      "vacuumLog must promote the reaped version's epoch tag")

    val rows = Snapshots.readLog(spark, root).count()
    val (st2, files2) = stageOne("e5b")
    assert(Snapshots.commitStagedEpoch(root, files2, "spec", 5L, st2)
      .isEmpty, "replay after maintenance must stay a no-op")
    assert(Snapshots.readLog(spark, root).count() == rows)
  }

  test("empty epoch writes the hint only — no empty version dir") {
    import spark.implicits._
    val root = tmp("graftsnap-empty")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "s"), root)
    val before = Snapshots.history(spark, root).count()
    assert(Snapshots.commitStagedEpoch(root, Nil, "spec", 11L,
      s"$root/_stage_spec/11").isEmpty)
    assert(Snapshots.history(spark, root).count() == before)
    assert(LakeFs.isFile(s"$root/_GRAFT_EPOCH_spec_11"))
  }
}
