package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeFs, Snapshots}

/** Writable branches over the append log: pinned base + isolated
  * sub-log, conflict-free merge by union semantics. */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(xs: Long*) = {
    import spark.implicits._
    xs.toDF("x")
  }
  private def rows(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.select("x").collect().map(_.getLong(0)).sorted.toSeq

  test("branch isolation, pin through retention, merge, drop") {
    val root = "/tmp/graft_branch_log"
    LakeFs.rmTree(root)
    Snapshots.publishAppend(df(1L), root) // v0
    Snapshots.publishAppend(df(2L), root) // v1
    val base = Snapshots.createBranch(root, "backfill")
    assert(base == 2L, s"branch pins the latest committed version, got $base")
    intercept[IllegalArgumentException](
      Snapshots.createBranch(root, "backfill"))
    // branch writes are invisible to main; main writes invisible to
    // the branch's pinned base
    Snapshots.publishBranch(df(10L), root, "backfill")
    Snapshots.publishAppend(df(3L), root) // main moves on: v2
    Snapshots.publishBranch(df(11L), root, "backfill")
    assert(rows(Snapshots.readLog(spark, root)) == Seq(1L, 2L, 3L),
      "main must not see branch rows")
    assert(rows(Snapshots.readBranch(spark, root, "backfill")) ==
      Seq(1L, 2L, 10L, 11L),
      "branch = pinned base ∪ branch appends, without main's interim v2")
    // retention honors the branch pin: compact main and vacuum — the
    // base window the branch reads must survive
    Snapshots.compactLog(spark, root)
    Snapshots.vacuumLog(root)
    assert(rows(Snapshots.readBranch(spark, root, "backfill")) ==
      Seq(1L, 2L, 10L, 11L), "branch read must survive main retention")
    // merge: branch rows land as one new main version, branch gone
    val mv = Snapshots.mergeBranch(spark, root, "backfill")
    assert(mv.nonEmpty)
    assert(rows(Snapshots.readLog(spark, root)) ==
      Seq(1L, 2L, 3L, 10L, 11L), "merge must union branch onto main")
    assert(Snapshots.branches(root).isEmpty)
    assert(!LakeFs.exists(s"$root/branch=backfill"))
    // a dropped branch leaves main untouched
    Snapshots.createBranch(root, "risky")
    Snapshots.publishBranch(df(99L), root, "risky")
    Snapshots.dropBranch(root, "risky")
    assert(rows(Snapshots.readLog(spark, root)) ==
      Seq(1L, 2L, 3L, 10L, 11L), "dropped branch must leave no rows")
    // an empty branch merges as a no-op publish
    Snapshots.createBranch(root, "empty")
    assert(Snapshots.mergeBranch(spark, root, "empty").isEmpty)

    // a merge that crashed between the publish and the drop must not
    // double the branch rows on retry: the committed merge version
    // carries its from-branch marker, so a retry finds it
    val crashBase = Snapshots.createBranch(root, "crashy")
    Snapshots.publishBranch(df(77L), root, "crashy")
    val before = rows(Snapshots.readLog(spark, root))
    val mv2 = Snapshots.mergeBranch(spark, root, "crashy")
    assert(mv2.nonEmpty)
    val after = rows(Snapshots.readLog(spark, root))
    assert(after == (before :+ 77L).sorted)
    // crash state: branch marker + sub-log restored as if the drop
    // never ran — the retry must find the committed merge and only
    // complete the drop
    LakeFs.write(s"$root/_SNAP_BRANCH_crashy", crashBase.toString)
    Snapshots.publishBranch(df(77L), root, "crashy")
    assert(Snapshots.mergeBranch(spark, root, "crashy") == mv2,
      "retry of a crashed merge must resolve to the committed version")
    assert(rows(Snapshots.readLog(spark, root)) == after,
      "crashed-merge retry doubled the branch rows")
    assert(Snapshots.branches(root).isEmpty)
    // name reuse after a completed merge: the old merge version sits
    // at or below the new base, so a fresh same-name branch merges
    // its own rows normally
    Snapshots.createBranch(root, "crashy")
    Snapshots.publishBranch(df(88L), root, "crashy")
    assert(Snapshots.mergeBranch(spark, root, "crashy").exists(_ > mv2.get))
    assert(rows(Snapshots.readLog(spark, root)) == (after :+ 88L).sorted)

    // a tombstoned (merge-on-read) root refuses branching loudly
    val morRoot = "/tmp/graft_branch_mor"
    LakeFs.rmTree(morRoot)
    Snapshots.publishAppend(df(5L), morRoot)
    Snapshots.publishDeletes(df(5L), morRoot)
    intercept[IllegalArgumentException](
      Snapshots.createBranch(morRoot, "b"))
  }
}
