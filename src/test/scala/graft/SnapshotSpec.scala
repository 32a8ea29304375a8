package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexLifecycle, Snapshots}

/** Laws of the versioned snapshot tables (operators.Snapshots): time
  * travel, torn-write invisibility, and vacuum retention. */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_snap_spec/$tag"
    IndexLifecycle.rm(new java.io.File(root))
    new java.io.File(root).mkdirs()
    root
  }

  test("time travel: as-of reads resolve the newest committed version at or before") {
    import spark.implicits._
    val root = freshRoot("timetravel")
    val v1 = Snapshots.publish(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    val v2 = Snapshots.publish(Seq((1L, "a2")).toDF("k", "v"), root)
    assert(v1 == 1L && v2 == 2L)
    assert(Snapshots.latestVersion(root).contains(2L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(Snapshots.read(spark, root)) == Set(1L -> "a2"))
    assert(rows(Snapshots.read(spark, root, asOf = Some(1L)))
      == Set(1L -> "a", 2L -> "b"))
    // as-of BETWEEN versions resolves downward, as-of before v1 errors
    assert(rows(Snapshots.read(spark, root, asOf = Some(5L))) == Set(1L -> "a2"))
    intercept[RuntimeException](Snapshots.read(spark, root, asOf = Some(0L)))
  }

  test("a torn write is invisible and its version number is never reused") {
    import spark.implicits._
    val root = freshRoot("torn")
    Snapshots.publish(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a writer crash: data present, no commit marker
    val torn = new java.io.File(s"$root/v=2")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/v=2/part-junk.parquet"), "garbage")
    assert(Snapshots.latestVersion(root).contains(1L),
      "reader must not see the uncommitted version")
    assert(Snapshots.read(spark, root).count() == 1L)
    // the next publish allocates PAST the torn dir — never reuses it
    val v3 = Snapshots.publish(Seq((9L, "c")).toDF("k", "v"), root)
    assert(v3 == 3L, s"allocated v=$v3 over a torn v=2")
    assert(Snapshots.read(spark, root).collect().map(_.getLong(0)).toSet
      == Set(9L))
  }

  test("vacuum keeps the newest K committed snapshots and reaps torn dirs") {
    import spark.implicits._
    val root = freshRoot("vacuum")
    (1 to 5).foreach(i =>
      Snapshots.publish(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    // a torn dir below the latest commit is reaped too
    new java.io.File(s"$root/v=2").delete() // replace committed v2 …
    IndexLifecycle.rm(new java.io.File(s"$root/v=2"))
    new java.io.File(s"$root/v=2").mkdirs() // … with a torn shell
    Snapshots.vacuum(root, keep = 2)
    val left = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(left == Set("v=4", "v=5"), s"after vacuum: $left")
    assert(Snapshots.read(spark, root).collect().head.getString(1) == "v5")
    assert(Snapshots.read(spark, root, asOf = Some(4L))
      .collect().head.getString(1) == "v4")
    intercept[RuntimeException](Snapshots.read(spark, root, asOf = Some(3L)))
  }

  test("merge publish: matched rows replaced, new keys appended, tombstones dropped, base intact") {
    import spark.implicits._
    val root = freshRoot("merge")
    val v1 = Snapshots.publish(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    Snapshots.publishMerge(spark, root, "k",
      upserts = Seq((2L, "b2"), (9L, "new")).toDF("k", "v"),
      deleteKeys = Seq(3L).toDF("k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(Snapshots.read(spark, root))
      == Set(1L -> "a", 2L -> "b2", 9L -> "new"))
    // the merge is itself a version: the base stays time-travelable
    assert(rows(Snapshots.read(spark, root, asOf = Some(v1)))
      == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("append log: readers see the union prefix; as-of cuts at version boundaries") {
    import spark.implicits._
    val root = freshRoot("log")
    Snapshots.publishAppend(Seq(1L, 2L).toDF("k"), root)
    Snapshots.publishAppend(Seq(3L).toDF("k"), root)
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L))
    assert(ks(Snapshots.readLog(spark, root, asOf = Some(1L))) == Set(1L, 2L))
    intercept[IllegalArgumentException](
      Snapshots.readLog(spark, root, asOf = Some(0L)))
  }

  test("log compaction folds the union, preserves reads, and vacuumLog reaps the prefix") {
    import spark.implicits._
    val root = freshRoot("compact")
    Snapshots.publishAppend(Seq(1L, 2L).toDF("k"), root)
    Snapshots.publishAppend(Seq(3L).toDF("k"), root)
    Snapshots.publishAppend(Seq(4L).toDF("k"), root)
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val c = Snapshots.compactLog(spark, root)
    assert(c == 4L)
    // reads unchanged; the reader now unions ONE path, not three
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L, 4L))
    // pre-compaction time travel still works while the prefix remains
    assert(ks(Snapshots.readLog(spark, root, asOf = Some(2L))) == Set(1L, 2L, 3L))
    // appends after compaction stack on top of the fold
    Snapshots.publishAppend(Seq(9L).toDF("k"), root)
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L, 4L, 9L))
    Snapshots.vacuumLog(root)
    val left = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("v=")).toSet
    assert(left == Set("v=4", "v=5"), s"after vacuumLog: $left")
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L, 4L, 9L),
      "reads must survive the reap")
  }

  test("streaming snapshot ingest: micro-batches become committed versions exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot("stream")
    IndexLifecycle.rm(new java.io.File(root + "_ckpt"))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = graft.streaming.StreamOps.snapshotIngest(spark,
      ms.toDF().toDF("k"), root)
    try {
      ms.addData(1L, 2L); q.processAllAvailable()
      ms.addData(3L); q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.latestVersion(root).contains(2L),
      "each micro-batch must publish exactly one committed version")
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L))
    // a reader pinned to the first epoch's boundary sees that prefix
    assert(ks(Snapshots.readLog(spark, root, asOf = Some(1L))) == Set(1L, 2L))
    // foreachBatch retry: replaying the last epoch publishes nothing
    graft.streaming.StreamOps.snapshotIngestBatch(
      Seq(3L).toDF("k"), 1L, root)
    assert(Snapshots.latestVersion(root).contains(2L),
      "epoch replay appended a duplicate version")
    assert(ks(Snapshots.readLog(spark, root)) == Set(1L, 2L, 3L))
  }
}
