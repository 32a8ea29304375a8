package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary.ImageCodec
import graft.operators.LakeFs
import graft.streaming.StreamOps

/** StreamOps.fingerprintIngest — perceptual dedup at ingest time,
  * driven here by the image dHash codec (the audio/video codecs ride
  * the identical shape). Planted: doc 3 (batch 2) is a brightness-12
  * re-encode of doc 1 (batch 1) — the cross-batch pair — and docs
  * 4/5 (batch 2) are shift variants of one seed — the in-batch pair;
  * doc 2 is unrelated. */
class FingerprintIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cross-batch and in-batch pairs surface; replay and torn-marker replay are no-ops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = "/tmp/graft_fp_ingest_idx"
    val outDir = "/tmp/graft_fp_ingest_out"
    Seq(idxDir, outDir, outDir + "_ckpt").foreach(LakeFs.rmTree)

    def png(seed: Long, shift: Int) =
      ImageCodec.plantedPngMixed(seed, 12, 9, shift)
    val b1 = Seq(1L -> png(101L, 0), 2L -> png(202L, 0))
    val b2 = Seq(3L -> png(101L, 12), 4L -> png(303L, 0),
      5L -> png(303L, 7))

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.fingerprintIngest(spark,
      ms.toDF().toDF("doc_id", "data"),
      (s, b) => ImageCodec.hashImages(s, b), "dhash", idxDir, outDir)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def pairs(): Map[(Long, Long), Long] =
      spark.read.parquet(outDir)
        .select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = pairs()
    assert(got == Map((1L, 3L) -> 0L, (4L, 5L) -> 0L),
      s"planted pair set: $got")

    // epoch replay: marker skips the append, emit overwrites in place
    val idxRows = spark.read.parquet(s"$idxDir/hashes").count()
    StreamOps.fingerprintIngestBatch(spark, b2.toDF("doc_id", "data"), 1L,
      (s, b) => ImageCodec.hashImages(s, b), "dhash", idxDir, outDir)
    assert(spark.read.parquet(s"$idxDir/hashes").count() == idxRows
      && pairs() == got, "epoch replay changed state")

    // torn-marker replay re-appends (the residual window) — duplicate
    // index rows must be absorbed by the candidate distinct
    LakeFs.rmFile(s"$idxDir/_GRAFT_EPOCH_1")
    StreamOps.fingerprintIngestBatch(spark, b2.toDF("doc_id", "data"), 1L,
      (s, b) => ImageCodec.hashImages(s, b), "dhash", idxDir, outDir)
    assert(spark.read.parquet(s"$idxDir/hashes").count() > idxRows,
      "the torn-marker window is real (rows re-appended)")
    assert(pairs() == got,
      "duplicate index rows leaked into the emitted pairs")
  }
}
