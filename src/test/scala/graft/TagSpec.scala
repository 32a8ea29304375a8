package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeFs, Snapshots}

/** Named tags — immutable version pins the vacuum family honors. */
class TagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(xs: Long*) = {
    import spark.implicits._
    xs.toDF("x")
  }
  private def rows(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("x").collect().map(_.getLong(0)).toSet

  test("snapshot flavor: tagged version survives vacuum; untag releases it") {
    val root = "/tmp/graft_tag_snap"
    LakeFs.rmTree(root)
    val v0 = Snapshots.publish(df(1L), root)
    Snapshots.publish(df(1L, 2L), root)
    Snapshots.publish(df(1L, 2L, 3L), root)
    Snapshots.tag(root, "baseline", v0)
    // immutability + validity guards
    intercept[IllegalArgumentException](Snapshots.tag(root, "baseline", v0))
    intercept[IllegalArgumentException](Snapshots.tag(root, "nope", 99L))
    intercept[IllegalArgumentException](Snapshots.tag(root, "bad name", v0))
    // history surfaces the pin on its version
    val h = Snapshots.history(spark, root).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](7)).toMap
    assert(h(v0) == Seq("baseline") && h.filterKeys(_ != v0).values
      .forall(_.isEmpty), s"history tags column: $h")
    Snapshots.vacuum(root, keep = 1)
    // v0 pinned; the untagged middle version reaped
    assert(rows(Snapshots.readTag(spark, root, "baseline")) == Set(1L))
    assert(rows(Snapshots.read(spark, root, asOf = Some(1L))) == Set(1L),
      "as-of between reaped versions resolves to the pinned older one")
    assert(rows(Snapshots.read(spark, root)) == Set(1L, 2L, 3L))
    // untag + vacuum reaps
    Snapshots.untag(root, "baseline")
    Snapshots.vacuum(root, keep = 1)
    intercept[RuntimeException](Snapshots.readTag(spark, root, "baseline"))
    assert(Snapshots.history(spark, root).count() == 1L,
      "only the latest version remains after untag + vacuum")
  }

  test("log flavor: a tag pins its WHOLE as-of reader window through vacuumLog") {
    val root = "/tmp/graft_tag_log"
    LakeFs.rmTree(root)
    Snapshots.publishAppend(df(1L), root) // v0
    val v1 = Snapshots.publishAppend(df(2L), root)
    Snapshots.publishAppend(df(3L), root)
    Snapshots.publishAppend(df(4L), root)
    Snapshots.tag(root, "cut", v1)
    Snapshots.compactLog(spark, root) // window collapses to the fold
    Snapshots.vacuumLog(root)
    // the tag needs v0 AND v1 (its as-of window) — both must survive
    assert(rows(Snapshots.readLog(spark, root, asOf = Some(v1))) ==
      Set(1L, 2L), "pinned as-of window reads exactly its prefix")
    assert(rows(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L, 4L))
    Snapshots.untag(root, "cut")
    Snapshots.vacuumLog(root)
    intercept[Exception](
      Snapshots.readLog(spark, root, asOf = Some(v1)).collect())
  }
}
