package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshot tables — the time-travel/ACID-read layer a lake
  * without a table format still needs (the core of what Iceberg's
  * version-hint file and Delta's _last_checkpoint provide, reduced to
  * its minimal marker protocol):
  *
  *   <root>/v=<n>/...parquet         one immutable snapshot
  *   <root>/v=<n>/_SNAP_COMMITTED    publish marker, written LAST
  *
  * Readers resolve a snapshot by scanning version dirs and taking the
  * highest COMMITTED one (or the highest committed <= an as-of
  * version) — so a writer that crashes mid-write leaves a torn,
  * marker-less directory that is simply invisible: readers never see
  * a partial table, and the next publish allocates past it. Single
  * writer per table assumed (the nightly-job model; a multi-writer
  * lake adds a log service, which is out of scope by design).
  *
  * Scale shape: publishing is one parquet write (all the cost is the
  * data); resolution is one directory listing, O(versions) names, no
  * data reads. On an object store the same protocol holds — the
  * marker PUT is the atomic commit point. Old snapshots are retired
  * by `vacuum` (keep the newest K committed), the retention job every
  * versioned lake runs. */
object Snapshots {

  private val Marker = "_SNAP_COMMITTED"
  private val VDir = "^v=(\\d+)$".r

  private def versionOf(f: java.io.File): Option[Long] = f.getName match {
    case VDir(n) => Some(n.toLong)
    case _ => None
  }

  private def versions(root: String): Seq[(Long, java.io.File)] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .flatMap(f => versionOf(f).map(_ -> f)).toSeq.sortBy(_._1)
  }

  private def committed(root: String): Seq[(Long, java.io.File)] =
    versions(root).filter { case (_, f) =>
      new java.io.File(f, Marker).isFile
    }

  /** Write `df` as the next snapshot of `root` and commit it.
    * Returns the published version. Allocation skips past torn
    * (uncommitted) directories, never reusing their numbers. */
  def publish(df: DataFrame, root: String): Long = {
    val n = versions(root).lastOption.map(_._1).getOrElse(0L) + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v=$n")
    val ok = new java.io.File(s"$root/v=$n", Marker).createNewFile()
    require(ok, s"snapshot v=$n already committed — concurrent writer?")
    n
  }

  /** The latest committed snapshot, or (with `asOf`) the newest
    * committed snapshot at or before that version — time travel. */
  def read(s: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val live = committed(root)
    val pick = asOf match {
      case Some(v) => live.takeWhile(_._1 <= v).lastOption
      case None => live.lastOption
    }
    val (v, f) = pick.getOrElse(sys.error(
      s"no committed snapshot in $root" +
        asOf.map(v => s" at or before v=$v").getOrElse("")))
    require(v >= 0, "unreachable")
    s.read.parquet(f.getPath)
  }

  /** Latest committed version number, None when the table is empty. */
  def latestVersion(root: String): Option[Long] =
    committed(root).lastOption.map(_._1)

  /** Append-log flavor: each committed version holds one BATCH, and
    * a reader resolves the UNION of every committed version (up to an
    * as-of version) — the CDC/ingest-table shape where publishing a
    * micro-batch costs O(batch), never an O(table) rewrite. Torn
    * directories stay invisible exactly as in the snapshot flavor. */
  def publishAppend(df: DataFrame, root: String): Long = publish(df, root)

  private val Base = "_SNAP_BASE"

  /** Union of all committed versions (<= `asOf` when given) — except
    * that a COMPACTED version (one carrying a base marker, see
    * compactLog) subsumes everything at or before it, so the reader
    * unions the newest compacted version in range plus the committed
    * versions after it. Empty log errors like an empty snapshot
    * table. */
  def readLog(s: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val live = asOf match {
      case Some(v) => committed(root).takeWhile(_._1 <= v)
      case None => committed(root)
    }
    require(live.nonEmpty, s"no committed snapshot in $root" +
      asOf.map(v => s" at or before v=$v").getOrElse(""))
    val lastCompact = live.lastIndexWhere { case (_, f) =>
      new java.io.File(f, Base).isFile
    }
    val window = if (lastCompact < 0) live else live.drop(lastCompact)
    // one multi-path scan, not a union-of-plans: O(versions) paths in
    // a single FileScan; compactLog folds the path count back down
    s.read.parquet(window.map(_._2.getPath): _*)
  }

  /** The small-files job the append log needs: fold every committed
    * version the current reader would union into ONE new compacted
    * version. The base marker is written BEFORE the commit marker, so
    * a committed compaction always knows it subsumes its prefix and a
    * crash mid-compaction leaves an invisible torn dir — readers are
    * never double-counted and never see a partial fold. Old versions
    * stay on disk (readers mid-flight may hold them; time travel to
    * pre-compaction boundaries keeps working) until vacuumLog reaps
    * them. Returns the compacted version. */
  def compactLog(s: SparkSession, root: String): Long = {
    val folded = readLog(s, root)
    val n = versions(root).lastOption.map(_._1).getOrElse(0L) + 1
    folded.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v=$n")
    val dir = new java.io.File(s"$root/v=$n")
    require(new java.io.File(dir, Base).createNewFile(), s"base marker v=$n")
    require(new java.io.File(dir, Marker).createNewFile(), s"commit marker v=$n")
    n
  }

  /** Log retention: delete committed versions strictly below the
    * newest compacted version (they are subsumed and no longer read),
    * torn dirs below the latest commit, and epoch markers below the
    * retention horizon. Time travel below the compaction boundary is
    * given up — the same trade every log-structured table's retention
    * makes. */
  def vacuumLog(root: String): Unit = {
    val live = committed(root)
    live.lastIndexWhere { case (_, f) =>
      new java.io.File(f, Base).isFile
    } match {
      case i if i > 0 =>
        val keepFrom = live(i)._1
        val latest = live.last._1
        versions(root).foreach { case (v, f) =>
          val isCommitted = new java.io.File(f, Marker).isFile
          if ((isCommitted && v < keepFrom) || (!isCommitted && v < latest))
            IndexLifecycle.rm(f)
        }
      case _ => ()
    }
  }

  /** True iff `epochOnce` already published this epoch for `root` —
    * see StreamOps.snapshotIngest. Marker protocol and naming are
    * IndexLifecycle.epochOnce's, not a parallel implementation. */
  def epochPublished(root: String, epoch: Long): Boolean =
    new java.io.File(root, s"_GRAFT_EPOCH_$epoch").isFile

  /** Exactly-once per-epoch publish: a replayed micro-batch (same
    * epoch id) skips the publish instead of appending a duplicate
    * version — the foreachBatch retry contract, delegated to
    * IndexLifecycle.epochOnce (ONE marker-gated protocol in the
    * codebase: checked first, written last, with the same documented
    * residual window — crash after commit, before marker — that log
    * readers deduping on a batch key absorb). Returns the published
    * version, None when the epoch had already run. */
  def epochOnce(root: String, epoch: Long)(publishFn: => Long): Option[Long] = {
    var v: Option[Long] = None
    IndexLifecycle.epochOnce(root, epoch) { v = Some(publishFn) }
    v
  }

  /** MERGE-publish: the next snapshot is the previous one with
    * `upserts` applied by `key` (matched rows replaced, new keys
    * appended) and `deleteKeys` dropped (tombstones) — the MERGE INTO
    * shape on top of the snapshot protocol, so every merge is itself
    * an immutable, time-travelable version and a crashed merge leaves
    * the table on its previous snapshot (torn-dir rule). Cost is one
    * anti-join plus the snapshot rewrite — the copy-on-write flavor;
    * a change-heavy table amortizes through the append log + a
    * compaction instead. Requires a base snapshot (publish first). */
  def publishMerge(s: SparkSession, root: String, key: String,
      upserts: DataFrame, deleteKeys: DataFrame): Long = {
    val gone = upserts.select(org.apache.spark.sql.functions.col(key))
      .unionByName(deleteKeys.select(org.apache.spark.sql.functions.col(key)))
    val next = read(s, root)
      .join(gone, Seq(key), "left_anti")
      .unionByName(upserts)
    publish(next, root)
  }

  private val EpochMarker = "^_GRAFT_EPOCH_(\\d+)$".r

  /** Retention: keep the newest `keep` committed snapshots, delete
    * every older committed one AND every torn directory below the
    * newest committed version (torn dirs are invisible to readers and
    * safe to reap once a newer commit exists). Epoch markers are
    * retained for the newest `keep` epochs and reaped below that —
    * foreachBatch only ever replays the LATEST epoch, so a marker
    * older than the retention horizon can no longer gate anything,
    * and without the reap a long-lived stream's markers would grow
    * the root listing (walked by every read/publish) without bound. */
  def vacuum(root: String, keep: Int): Unit = {
    require(keep > 0, s"vacuum(keep=$keep): retention must keep >= 1 snapshot")
    val live = committed(root)
    if (live.nonEmpty) {
      val keepFrom = live.takeRight(keep).head._1
      val latest = live.last._1
      versions(root).foreach { case (v, f) =>
        val isCommitted = new java.io.File(f, Marker).isFile
        if ((isCommitted && v < keepFrom) || (!isCommitted && v < latest))
          IndexLifecycle.rm(f)
      }
      val epochs = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .flatMap(f => f.getName match {
          case EpochMarker(e) => Some(e.toLong -> f)
          case _ => None
        }).sortBy(_._1)
      epochs.dropRight(keep).foreach(_._2.delete())
    }
  }
}
