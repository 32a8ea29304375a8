package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The one place lake metadata touches a filesystem. Snapshots and
  * IndexLifecycle address their roots exclusively through this facade,
  * which resolves every path against the Hadoop `FileSystem` API — so
  * a table root may be `file:/...`, `hdfs://...`, or `s3a://...` and
  * the marker protocols run unchanged on all of them (the resolver is
  * `Path.getFileSystem` over the active session's Hadoop conf, the
  * same resolution Spark's own readers use).
  *
  * Atomicity contract, per store — callers rely on exactly this:
  *
  *  - `createMarker` (create-if-absent) is the COMMIT POINT of the
  *    snapshot protocol. Atomic on HDFS and local filesystems
  *    (namenode / O_EXCL create). On S3-class stores, `create(p,
  *    overwrite=false)` is HEAD-then-PUT — a microscopic two-writer
  *    race that the single-writer-per-table assumption (documented in
  *    Snapshots) already excludes; conditional-PUT stores (GCS
  *    generation match, S3 If-None-Match) close even that.
  *  - `rename` is atomic on HDFS/local. On object stores it degrades
  *    to copy+delete: directory swaps (IndexLifecycle.republish /
  *    buildOnce) therefore widen their not-atomic window from two
  *    renames to a copy — readers holding open handles are still
  *    safe (objects are immutable; deletes don't revoke open reads),
  *    but a reader LISTING the index mid-swap can observe a partial
  *    tree. The snapshot layer never renames — its publish is
  *    write-then-marker, object-store-safe by construction — so
  *    prefer snapshot-versioned state over in-place swaps on S3.
  *  - `list`/`status` are strongly consistent on HDFS and on S3
  *    since 2020 (and on GCS/ABFS); the protocols assume list-after-
  *    write visibility of the commit markers.
  *
  * All calls here are control-plane: O(versions) per publish/read,
  * never per row — data I/O stays with Spark's own committers. */
object LakeFs {

  /** The active session's Hadoop conf (so `fs.s3a.*` / `fs.defaultFS`
    * settings flow through), or a vanilla conf when no session exists
    * (spec setup/teardown paths). */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Direct children of `dir`; empty when `dir` does not exist. */
  def list(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    try fsOf(p).listStatus(p).toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Every FILE under `dir`, recursively; empty when absent. */
  def leaves(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val out = Seq.newBuilder[FileStatus]
    try {
      val it = fsOf(p).listFiles(p, true)
      while (it.hasNext) out += it.next()
    } catch { case _: java.io.FileNotFoundException => }
    out.result()
  }

  def status(path: String): Option[FileStatus] = {
    val p = new Path(path)
    try Some(fsOf(p).getFileStatus(p))
    catch { case _: java.io.FileNotFoundException => None }
  }

  def isFile(path: String): Boolean = status(path).exists(_.isFile)

  def isDir(path: String): Boolean = status(path).exists(_.isDirectory)

  def exists(path: String): Boolean = status(path).isDefined

  /** Create-if-absent of an empty file — the atomic commit primitive
    * (see the store-by-store contract above). False when it already
    * exists or a racer created it first.
    *
    * Local paths take the O_EXCL syscall directly: Hadoop's
    * Local/RawLocalFileSystem implements createNewFile as
    * exists-then-create — a check-then-act window in which two
    * in-process writers (the OCC claim race, Snapshots.claimNext)
    * can BOTH observe success. HDFS arbitrates at the namenode, so
    * the Hadoop call keeps its atomicity there; this carve-out is
    * the facade doing its job — one primitive, the strongest
    * implementation each store offers. */
  def createMarker(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p) match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
          _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val f = new java.io.File(p.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        try f.createNewFile()
        catch { case _: java.io.IOException => false }
      case fs =>
        try fs.createNewFile(p)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
        }
    }
  }

  /** Overwrite `path` with `content` (small metadata payloads only —
    * marker keys, never data). */
  def write(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fsOf(p).create(p, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
  }

  /** Full content of a small metadata file, None when absent. */
  def readString(path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(p)
    try {
      if (!fs.getFileStatus(p).isFile) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(), UTF_8)) finally in.close()
      }
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Rename with java.io.File-style collision semantics: false when
    * `dst` already exists (Hadoop's native rename would move `src`
    * INTO an existing directory, which no caller here ever wants).
    * Atomic on HDFS/local; copy+delete on object stores — see the
    * facade contract. */
  def rename(src: String, dst: String): Boolean = {
    val sp = new Path(src)
    val dp = new Path(dst)
    val fs = fsOf(sp)
    if (fs.exists(dp)) false
    else try fs.rename(sp, dp)
    catch { case _: java.io.FileNotFoundException => false }
  }

  /** Recursive delete; no-op when absent. */
  def rmTree(path: String): Unit = {
    val p = new Path(path)
    try fsOf(p).delete(p, true)
    catch { case _: java.io.FileNotFoundException => }
    ()
  }

  /** Delete one file; no-op when absent. */
  def rmFile(path: String): Unit = {
    val p = new Path(path)
    try fsOf(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => }
    ()
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).mkdirs(p)
    ()
  }
}
