package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Text
import graft.streaming.StreamOps

/** Streaming spelling correction (StreamOps.spellIngest): stream-time
  * corrections against the frozen spell index must equal the batch
  * serving dataflow's answers for the same docs, whatever the batch
  * split, with replayed epochs idempotent. */
class SpellStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Dir = "/root/testdata/sf0.001"
  private val Out = "/tmp/graft_spell_stream"

  test("streamed corrections equal the batch serving path; replay is idempotent") {
    graft.operators.LakeFs.rmTree(Out)
    graft.operators.LakeFs.rmTree(Out + "_ckpt")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idx = Text.spellIndexOf(spark, Dir)
    // typo docs derived from the corpus itself (the planted-typo
    // rule): each vocab word of length >= 6, 3rd char deleted
    val typos = spark.read.parquet(s"$idx/vocab")
      .filter(length(col("w")) >= 6)
      .select(concat(col("w").substr(1, 2),
        col("w").substr(lit(4), length(col("w")))).as("text"))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(typos.nonEmpty, "corpus must yield at least one typo")
    val (b1, b2) = typos.splitAt(typos.size / 2)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val q = StreamOps.spellIngest(spark,
      ms.toDF().toDF("text"), idx, Out)
    ms.addData(b1: _*)
    q.processAllAvailable()
    ms.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
      df.select("token", "correction", "tf").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamed = rows(spark.read.parquet(Out))
    val expected = rows(Text.spellCorrectionsFrom(spark, idx,
      typos.toDF("text").select(explode(
        graft.functions.TextExprs.tokens(col("text"))).as("w"))))
    assert(expected.nonEmpty && streamed == expected,
      s"stream/batch drift: ${streamed.diff(expected)} vs " +
        s"${expected.diff(streamed)}")
    // replayed epoch: dynamic overwrite replaces its own partition
    StreamOps.spellBatch(spark, b2.toDF("text"), epoch = 1L, idx, Out)
    assert(rows(spark.read.parquet(Out)) == expected)
  }
}
