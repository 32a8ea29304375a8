package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeFs, Snapshots}

/** Laws of the graftsnap BATCH read — the Delta-style
  * `spark.read.format("graftsnap")` surface over the snapshot log:
  * window resolution parity with Snapshots.readLog (compaction
  * subsumption, version/timestamp time travel), per-file null-fill
  * schema evolution, column pruning, and the MoR refusal. */
class GraftsnapBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_snapbatch_spec/$tag"
    LakeFs.rmTree(root)
    new java.io.File(root).mkdirs()
    root
  }

  private def batch(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graftsnap")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(root)
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("batch read equals readLog, through a compaction fold") {
    import spark.implicits._
    val root = freshRoot("parity")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.publishAppend(Seq((2L, "b")).toDF("k", "v"), root)
    assert(ks(batch(root)) == Seq(1L, 2L))
    assert(ks(batch(root)) == ks(Snapshots.readLog(spark, root)))
    // a full fold subsumes the appends below — the batch scan must
    // resolve the window, not union every version dir (no doubles)
    Snapshots.compactLog(spark, root)
    Snapshots.publishAppend(Seq((3L, "c")).toDF("k", "v"), root)
    assert(ks(batch(root)) == Seq(1L, 2L, 3L))
    assert(ks(batch(root)) == ks(Snapshots.readLog(spark, root)))
  }

  test("versionAsOf and timestampAsOf time travel; both at once refuse") {
    import spark.implicits._
    val root = freshRoot("travel")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.publishAppend(Seq((2L, "b")).toDF("k", "v"), root)
    val t2 = Snapshots.commitTimestamp(root, 2L).get
    Thread.sleep(20)
    Snapshots.publishAppend(Seq((3L, "c")).toDF("k", "v"), root)
    assert(ks(batch(root, "versionAsOf" -> "2")) == Seq(1L, 2L))
    assert(ks(batch(root, "versionAsOf" -> "2"))
      == ks(Snapshots.readLog(spark, root, asOf = Some(2L))))
    assert(ks(batch(root, "timestampAsOf" -> t2.toString)) == Seq(1L, 2L))
    intercept[Exception](
      batch(root, "versionAsOf" -> "1", "timestampAsOf" -> "1").collect())
  }

  test("schema evolution null-fills old files; pruned scans stay correct") {
    import spark.implicits._
    val root = freshRoot("evolve")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.publishAppend(Seq((2L, "b", 7.5)).toDF("k", "v", "w"), root)
    val rows = batch(root).select("k", "w").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(1L -> None, 2L -> Some(7.5)),
      s"old version must null-fill the added column: $rows")
    // single-column projection through the pruned reader
    assert(ks(batch(root)) == Seq(1L, 2L))
  }

  test("columnar decode: default scan is vectorized, row-path parity bit-for-bit, count-only stays row") {
    import spark.implicits._
    val root = freshRoot("columnar")
    // all supported types incl. a timestamp and an evolved column
    Snapshots.publishAppend(Seq(
      (1L, 10, 1.5, 2.5f, true, "x", Array[Byte](1, 2),
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, 20, -1.5, 0f, false, "", Array[Byte](),
        java.sql.Timestamp.valueOf("2026-06-15 13:14:15.123456")))
      .toDF("k", "i", "d", "f", "b", "s", "bin", "ts"), root)
    Snapshots.publishAppend(Seq(
      (3L, 30, 0.0, 1f, true, "z", Array[Byte](9),
        java.sql.Timestamp.valueOf("2026-08-15 00:00:00"), "added"))
      .toDF("k", "i", "d", "f", "b", "s", "bin", "ts", "extra"), root)
    val columnarDf = batch(root)
    val rowDf = batch(root, "columnar" -> "false")
    // the default plan IS columnar; the opted-out plan is not
    def scanColumnar(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.exists(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.datasources
          .v2.BatchScanExec] && p.supportsColumnar)
    assert(scanColumnar(columnarDf), "default graftsnap scan must be columnar")
    assert(!scanColumnar(rowDf), "columnar=false must keep the row reader")
    // bit-for-bit parity across every type + evolution null-fill
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i) match {
          case a: Array[Byte] => a.mkString("[", ",", "]")
          case v => String.valueOf(v)
        }).mkString("|")).sorted.toSeq
    assert(canon(columnarDf) == canon(rowDf),
      "columnar and row decode must agree bit-for-bit")
    // projection parity (pruned vectorized read) and null-fill
    assert(canon(columnarDf.select("s", "extra", "ts"))
      == canon(rowDf.select("s", "extra", "ts")))
    // count-only scans keep the row reader's no-page fast path
    val countDf = batch(root).groupBy().count()
    assert(countDf.collect().head.getLong(0) == 3L)
    // and the streaming side delivers through the same columnar factory
    val ckpt = freshRoot("columnar_ckpt")
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graftsnap").load(root).select($"k")
      .writeStream.option("checkpointLocation", s"$ckpt/c")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.collect().map(_.getLong(0)) }; ()
      }.start()
    try { q.processAllAvailable() } finally q.stop()
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("pushed range filters prune files through the stats manifests") {
    import spark.implicits._
    val root = freshRoot("prune")
    // two versions, each range-clustered into 2 files with disjoint k
    // ranges and a per-file min/max manifest
    Snapshots.publishAppendWithStats(
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("k")),
      root, Seq("k"))
    Snapshots.publishAppendWithStats(
      (11L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("k")),
      root, Seq("k"))
    val allParts = batch(root).rdd.getNumPartitions
    assert(allParts == 4, s"setup: expected 4 files, got $allParts")
    // a selective range must plan strictly fewer files AND stay exact
    val sel = batch(root).filter("k >= 16 and k <= 18")
    assert(sel.rdd.getNumPartitions < allParts,
      s"pushdown planned ${sel.rdd.getNumPartitions} of $allParts files")
    assert(ks(sel) == Seq(16L, 17L, 18L))
    // equality prunes to one file's worth; strict bounds stay correct
    val eq = batch(root).filter("k = 3")
    assert(eq.rdd.getNumPartitions <= 1, eq.rdd.getNumPartitions)
    assert(ks(eq) == Seq(3L))
    assert(ks(batch(root).filter("k > 18")) == Seq(19L, 20L))
    // a version WITHOUT a manifest contributes all its files — rows
    // never lost to blind pruning
    Snapshots.publishAppend(Seq((21L, "x")).toDF("k", "v"), root)
    assert(ks(batch(root).filter("k >= 20")) == Seq(20L, 21L))
  }

  test("DSv2 writes ride the snapshot protocol: append and overwrite") {
    import spark.implicits._
    val root = freshRoot("write")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "v"), root)
    // append publishes one committed version through publishAppend
    Seq((2L, "b")).toDF("k", "v")
      .write.format("graftsnap").mode("append").save(root)
    assert(ks(batch(root)) == Seq(1L, 2L))
    assert(Snapshots.latestVersion(root).contains(2L))
    assert(ks(Snapshots.readLog(spark, root)) == Seq(1L, 2L),
      "DSv2 append must be a native log version")
    // overwrite REPLACES the readable window via a base version;
    // history below stays time-travelable
    Seq((9L, "z")).toDF("k", "v")
      .write.format("graftsnap").mode("overwrite").save(root)
    assert(ks(batch(root)) == Seq(9L))
    assert(ks(batch(root, "versionAsOf" -> "2")) == Seq(1L, 2L),
      "overwrite must not destroy time travel")
    // appends stack on top of the new base
    Seq((10L, "y")).toDF("k", "v")
      .write.format("graftsnap").mode("append").save(root)
    assert(ks(batch(root)) == Seq(9L, 10L))
  }

  test("a tombstoned merge-on-read window refuses the raw batch read") {
    import spark.implicits._
    val root = freshRoot("mor")
    Snapshots.publishAppend(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.publishDeletes(Seq((1L, "a")).toDF("k", "v"), root)
    val e = intercept[Exception](batch(root).collect())
    assert(e.getMessage.contains("readLogMerged"), e.getMessage)
  }
}
