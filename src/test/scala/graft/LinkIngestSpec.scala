package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LakeFs
import graft.streaming.StreamOps

/** StreamOps.linkIngest — fuzzy record linkage at ingest time.
  * Planted: "cold anvil" (batch 2) is edit-distance 1 from
  * "old anvil" (batch 1) — the cross-batch pair — and "red gear" /
  * "reed gear" (both batch 2) are the in-batch pair; "blue bolt"
  * shares no block with anything else. */
class LinkIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cross-batch and in-batch fuzzy pairs surface; replay and torn-marker replay are no-ops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = "/tmp/graft_link_ingest_idx"
    val outDir = "/tmp/graft_link_ingest_out"
    Seq(idxDir, outDir, outDir + "_ckpt").foreach(LakeFs.rmTree)

    val b1 = Seq(1L -> "old anvil", 2L -> "blue bolt")
    val b2 = Seq(3L -> "cold anvil", 4L -> "red gear", 5L -> "reed gear")

    // an EMPTY first micro-batch on the fresh index must be a no-op,
    // not a crash: before the fix it appended a zero-file dir and the
    // unconditional names read failed schema inference (ADVICE r13)
    StreamOps.linkIngestBatch(spark,
      b1.toDF("rec_id", "name").limit(0), 0L, idxDir, outDir)
    assert(!LakeFs.exists(s"$idxDir/names"),
      "empty first batch must not create the index")

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamOps.linkIngest(spark, ms.toDF().toDF("rec_id", "name"),
      idxDir, outDir)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def pairs(): Map[(String, String), Long] =
      spark.read.parquet(outDir)
        .select("name_a", "name_b", "edit_dist").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = pairs()
    assert(got == Map(("cold anvil", "old anvil") -> 1L,
      ("red gear", "reed gear") -> 1L), s"planted pair set: $got")

    // epoch replay: marker skips the append; the emit reclassifies
    // off the index's first-seen tags, so it rewrites the SAME pairs
    val idxRows = spark.read.parquet(s"$idxDir/names").count()
    StreamOps.linkIngestBatch(spark, b2.toDF("rec_id", "name"), 1L,
      idxDir, outDir)
    assert(spark.read.parquet(s"$idxDir/names").count() == idxRows
      && pairs() == got, "epoch replay changed state")

    // torn-marker replay (marker gone, rows already appended): the
    // first-seen anti-join absorbs the re-append entirely — no
    // duplicate index rows, identical pairs
    LakeFs.rmFile(s"$idxDir/_GRAFT_EPOCH_1")
    StreamOps.linkIngestBatch(spark, b2.toDF("rec_id", "name"), 1L,
      idxDir, outDir)
    assert(spark.read.parquet(s"$idxDir/names").count() == idxRows,
      "torn-marker replay duplicated index rows")
    assert(pairs() == got,
      "torn-marker replay changed the emitted pairs")

    // a RECURRING name in a later epoch neither grows the index nor
    // re-emits its pairs; only the genuinely new member's pairs emit
    val b3 = Seq(6L -> "old anvil", 7L -> "bold anvil")
    StreamOps.linkIngestBatch(spark, b3.toDF("rec_id", "name"), 2L,
      idxDir, outDir)
    assert(spark.read.parquet(s"$idxDir/names").count() == idxRows + 1,
      "recurring name grew the index")
    val got3 = pairs()
    assert(got3 == got ++ Map(
      ("bold anvil", "cold anvil") -> 1L,
      ("bold anvil", "old anvil") -> 1L), s"epoch-2 pair set: $got3")
  }

  test("batchFuzzyPairs equals the one-shot pair join on the union") {
    import spark.implicits._
    val all = Seq("old anvil", "cold anvil", "red gear", "reed gear",
      "blue bolt").toDF("name")
    val oneShot = graft.queries.Linkage
      .batchFuzzyPairs(all, spark.emptyDataset[String].toDF("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b1 = Seq("old anvil", "blue bolt").toDF("name")
    val b2 = Seq("cold anvil", "red gear", "reed gear").toDF("name")
    val incr =
      graft.queries.Linkage.batchFuzzyPairs(b1,
          spark.emptyDataset[String].toDF("name"))
        .unionByName(graft.queries.Linkage.batchFuzzyPairs(b2, b1))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(oneShot == incr, s"one-shot $oneShot vs incremental $incr")
  }
}
