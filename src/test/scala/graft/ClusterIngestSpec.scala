package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LakeFs
import graft.streaming.StreamOps

/** StreamOps.clusterIngest — log-structured union-find cluster
  * maintenance. The planted corpus forms three two-doc clusters in
  * batch 1 (c1 {1,2}, c2 {5,6}, d {10,11}; pairwise Jaccard 0.767 —
  * below the 0.8 gate), then batch 2's bridge doc 9 merges c2 with d
  * (remap 10 → 5) and batch 3's bridge doc 14 merges c1 with the
  * merged cluster (remap 5 → 1) — so resolving doc 10 must follow
  * the CHAIN 10 → 5 → 1 across two append-only remap rows.
  *
  * Geometry: 40-token docs, 3-gram shingles (38/doc). Changing k
  * consecutive tokens kills k+2 shingles; J = (38-(k+2))/(38+(k+2)):
  * k=3 → 33/43 = 0.767 (no pair), k=2 → 34/42 = 0.810 (pair),
  * k=1 → 35/41 = 0.854 (pair).
  */
class ClusterIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stateMap(dir: String): Map[Long, Long] =
    StreamOps.clusterState(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cross-batch merges land as remap rows; chains resolve; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = "/tmp/graft_clusteringest_idx"
    val clDir = "/tmp/graft_clusteringest_state"
    Seq(idxDir, clDir, clDir + "_ckpt").foreach(LakeFs.rmTree)

    val c1 = (0 until 40).map(i => s"t$i").toVector
    val c2 = c1.updated(16, "x0").updated(17, "x1").updated(18, "x2")
    val d = c2.updated(30, "y0").updated(31, "y1").updated(32, "y2")
    val bridge9 = c2.updated(30, "y0").updated(31, "y1") // c2~0.810, d~0.854
    val bridge14 = c1.updated(16, "x0").updated(17, "x1") // c1~0.810, c2~0.854
    def t(v: Vector[String]) = v.mkString(" ")
    // four unrelated singletons raise the build doc count to 10 so
    // the x/y-region shingles (df = 4 across the c2/d families) stay
    // under the hot cap (df·2 > nd) and candidate generation sees them
    val b1 = Seq(1L -> t(c1), 2L -> t(c1), 5L -> t(c2), 6L -> t(c2),
      10L -> t(d), 11L -> t(d)) ++
      Seq(30L, 31L, 32L, 33L).map(id =>
        id -> (0 until 40).map(i => s"s${id}w$i").mkString(" "))
    val b2 = Seq(9L -> t(bridge9))
    val b3 = Seq(14L -> t(bridge14))

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamOps.clusterIngest(spark,
      ms.toDF().toDF("doc_id", "text"), idxDir, clDir)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      assert(stateMap(clDir) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L,
        6L -> 5L, 10L -> 10L, 11L -> 10L), "three separate clusters after b1")
      ms.addData(b2: _*); q.processAllAvailable()
      assert(stateMap(clDir) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L,
        6L -> 5L, 9L -> 5L, 10L -> 5L, 11L -> 5L),
        "bridge 9 merges c2 and d under root 5")
      ms.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val want = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 9L -> 1L,
      10L -> 1L, 11L -> 1L, 14L -> 1L)
    assert(stateMap(clDir) == want,
      s"bridge 14 merges everything under root 1: ${stateMap(clDir)}")
    // the merge history is two append-only remap rows forming a chain
    val remap = spark.read.parquet(s"$clDir/remap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remap == Map(10L -> 5L, 5L -> 1L),
      s"chain 10 -> 5 -> 1 expected: $remap")
    // assignments are never rewritten: doc 10 still carries its
    // append-time label; resolution goes through the chain
    val rawAsg = spark.read.parquet(s"$clDir/assignments")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawAsg(10L) == 10L && rawAsg(9L) == 5L && rawAsg(14L) == 1L,
      s"append-time labels expected: $rawAsg")

    // exactly-once: replaying the last epoch is a no-op
    val remapRows = spark.read.parquet(s"$clDir/remap").count()
    val asgRows = spark.read.parquet(s"$clDir/assignments").count()
    StreamOps.clusterIngestBatch(spark, b3.toDF("doc_id", "text"), 2L,
      idxDir, clDir)
    assert(spark.read.parquet(s"$clDir/remap").count() == remapRows
      && spark.read.parquet(s"$clDir/assignments").count() == asgRows
      && stateMap(clDir) == want, "epoch replay changed cluster state")
    // torn-marker replay self-heals: endpoints resolve through the
    // already-appended state, the union-find no-ops, nothing lands
    LakeFs.rmFile(s"$clDir/_GRAFT_EPOCH_2")
    StreamOps.clusterIngestBatch(spark, b3.toDF("doc_id", "text"), 2L,
      idxDir, clDir)
    assert(spark.read.parquet(s"$clDir/remap").count() == remapRows
      && spark.read.parquet(s"$clDir/assignments").count() == asgRows
      && stateMap(clDir) == want, "torn-marker replay changed cluster state")

    // offline compaction folds the chain into the assignments: state
    // identical, remap/ gone, and later ingests stack on the fold
    StreamOps.compactClusterState(spark, clDir)
    assert(stateMap(clDir) == want, "compaction changed cluster state")
    assert(!LakeFs.exists(s"$clDir/remap"), "compaction must drop remap/")
    assert(spark.read.parquet(s"$clDir/assignments")
      .collect().map(r => r.getLong(1)).forall(_ == 1L),
      "folded assignments carry resolved roots")
    StreamOps.clusterIngestBatch(spark, Seq(17L -> t(c1))
      .toDF("doc_id", "text"), 3L, idxDir, clDir)
    assert(stateMap(clDir) == want + (17L -> 1L),
      "post-compaction ingest joins the folded cluster")
    assert(!LakeFs.exists(s"$clDir/remap"),
      "joining an existing root needs no remap row")
  }
}
