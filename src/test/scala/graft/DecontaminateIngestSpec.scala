package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LakeFs
import graft.streaming.StreamOps

/** StreamOps.decontaminateIngest — ingest-time eval-leak gating
  * through the registered decontaminate_substring dataflow. Planted:
  * a 40-token eval doc; batch docs either embed one exact 16-token
  * run copied from it (n_shared_runs = 1) or are clean. */
class DecontaminateIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("micro-batched leak gate == one-shot; leaks flagged exactly; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = "/tmp/graft_decon_ingest_out"
    val out1 = "/tmp/graft_decon_ingest_oneshot"
    Seq(out, out + "_ckpt", out1).foreach(LakeFs.rmTree)

    val evTokens = (0 until 40).map(i => s"e$i")
    val ev = Seq(100L -> evTokens.mkString(" ")).toDF("doc_id", "text")
    def leaked(id: Long, from: Int): (Long, String) =
      id -> ((0 until 4).map(i => s"u${id}a$i") ++
        evTokens.slice(from, from + 16) ++
        (0 until 4).map(i => s"u${id}b$i")).mkString(" ")
    def clean(id: Long): (Long, String) =
      id -> (0 until 24).map(i => s"u${id}c$i").mkString(" ")
    val b1 = Seq(leaked(1L, 10), clean(2L))
    val b2 = Seq(leaked(3L, 0), clean(4L))

    val evalIds = Seq(100L)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamOps.decontaminateIngest(spark,
      ms.toDF().toDF("doc_id", "text"), ev, out)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(dir: String): Map[Long, (Long, Boolean)] =
      spark.read.parquet(dir)
        .select("doc_id", "n_shared_runs", "contaminated")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
    val got = rows(out)
    assert(got == Map(
      1L -> (1L, true), 2L -> (0L, false),
      3L -> (1L, true), 4L -> (0L, false)), s"got $got")

    // one-shot over the same docs through the shared dataflow
    graft.queries.Dedup.substringContaminationOf(
        (b1 ++ b2).toDF("doc_id", "text").unionByName(ev),
        org.apache.spark.sql.functions.col("doc_id")
          .isInCollection(evalIds))
      .write.parquet(out1)
    assert(rows(out1) == got, "stream != one-shot")

    // replaying the last epoch overwrites its own partition, no dupes
    StreamOps.decontaminateBatch(spark, b2.toDF("doc_id", "text"), 1L,
      ev, evalIds, out)
    assert(rows(out) == got, "epoch replay changed the emitted rows")
    assert(spark.read.parquet(out).count() == 4L,
      "epoch replay appended duplicate rows")
  }
}
