package graft.operators

/** Build-once lifecycle for maintained lake indexes (ShingleIndex,
  * SubstringIndex, IvfIndex, PqIndex, IvfPq, the PCA sidecar).
  *
  * A real ingest builds its index ONCE and appends per batch;
  * re-deriving the whole index on every query would bill every read
  * for the build. The guard here makes that the default for every
  * index-backed query: the index lives at a STABLE path (so oracle
  * SQL can read its frozen-model sidecars), and the completion marker
  * CONTAINS the source+format version key — freshness and
  * completeness are one atomic check. A regenerated corpus or a
  * changed derivation bumps the key, the marker mismatches, and the
  * index rebuilds in place; no versioned sibling dirs accumulate
  * under /tmp (the r8 ADVICE growth finding).
  *
  * Publish is by atomic rename of a process-private build dir. Two
  * processes racing build equivalent indexes and one rename wins —
  * never a half-overwritten hybrid under a marker. The stale previous
  * dir is renamed ASIDE before deletion and the marker is re-checked
  * immediately before that move (the r8 ADVICE TOCTOU finding: a
  * racer may have published a complete index between our freshness
  * check and our publish — deleting it would orphan the racer's
  * lazily-evaluated readers mid-scan).
  */
object IndexLifecycle {

  private val Marker = "_GRAFT_INDEX_COMPLETE"

  /** Recursive tree delete — the one shared copy (Tables and the
    * lifecycle specs use it too). */
  private[graft] def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  /** The key the published index at `dir` was built under, if its
    * marker exists. A contentless marker (pre-r9 layout) reads as ""
    * and matches no key — legacy indexes rebuild once. */
  private def publishedKey(dir: java.io.File): Option[String] = {
    val m = new java.io.File(dir, Marker)
    if (!m.isFile) None
    else Some(new String(
      java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim)
  }

  /** Source-version + FORMAT-version key for index freshness. `fmt`
    * must change whenever the index derivation changes (window width,
    * fingerprint scheme, shingle width, stop rule, quantizer knobs,
    * layout) — otherwise a code change would silently serve a stale
    * incompatible index from /tmp.
    *
    * For a single-file source, (length, mtime) is the version. For a
    * DIRECTORY-style parquet source those two reflect nothing about
    * content (the r8 ADVICE staleness finding), so the key is derived
    * from the leaf files instead: an MD5 over every leaf's relative
    * path, length, and mtime — any rewrite of any part changes it. */
  def sourceKey(srcPath: String, fmt: String): String = {
    val f = new java.io.File(srcPath)
    if (f.isFile) s"${f.length}-${f.lastModified}-$fmt"
    else if (f.isDirectory) {
      def leaves(x: java.io.File): Seq[java.io.File] =
        Option(x.listFiles()).toSeq.flatten.sortBy(_.getName)
          .flatMap(c => if (c.isDirectory) leaves(c) else Seq(c))
      val md = java.security.MessageDigest.getInstance("MD5")
      val rootLen = f.getPath.length
      leaves(f).foreach { l =>
        // RELATIVE path, not basename: moving a same-named file
        // between partition subdirs must change the key
        val rel = l.getPath.drop(rootLen)
        md.update(s"$rel:${l.length}:${l.lastModified}|".getBytes("UTF-8"))
      }
      val hex = md.digest().take(8).map("%02x".format(_)).mkString
      s"d$hex-$fmt"
    } else s"absent-$fmt" // build runs and fails with the real error
  }

  /** In-place maintenance publish (compaction): run `rewrite` into a
    * process-private dir, carry the freshness marker over unchanged
    * (compaction changes the LAYOUT, not the logical content a key
    * describes), and swap by rename — the old tree goes ASIDE first,
    * then the rewritten tree renames in. The published path is absent
    * only for the instant between those two renames (a truly atomic
    * directory SWAP does not exist in portable Java); open readers
    * keep their file handles on the aside copy until it is reaped.
    *
    * Race guard: the marker is captured BEFORE the rewrite reads any
    * state and compared again at swap time — if a concurrent
    * buildOnce republished under a different key mid-compaction (the
    * source changed under us), this compaction's output describes
    * superseded state, so it ABORTS and leaves the racer's fresh
    * index in place rather than stamping old content with a new key. */
  def republish(idxDir: String)(rewrite: String => Unit): Unit = {
    val pid = ProcessHandle.current.pid
    val dst = new java.io.File(idxDir)
    val keyAtStart = publishedKey(dst)
    val tmp = new java.io.File(s"$idxDir.compact-$pid")
    rm(tmp)
    rewrite(tmp.getPath)
    keyAtStart.foreach { k =>
      java.nio.file.Files.write(
        new java.io.File(tmp, Marker).toPath, k.getBytes("UTF-8"))
    }
    // applied-epoch markers describe ingest HISTORY, not layout —
    // losing them across a compact/refit would re-open the
    // at-least-once window for any in-flight epoch retry. A marker
    // vanishing mid-copy means a racer republished under us; the
    // superseded check below aborts then, so skipping it is safe.
    Option(dst.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("_GRAFT_EPOCH_"))
      .foreach { f =>
        try java.nio.file.Files.copy(f.toPath,
          new java.io.File(tmp, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.NoSuchFileException => }
      }
    if (publishedKey(dst) != keyAtStart) { rm(tmp); return } // superseded
    val aside = new java.io.File(s"$idxDir.old-$pid")
    rm(aside)
    if (!dst.renameTo(aside)) {
      rm(tmp) // never leak an index-sized build dir
      sys.error(s"compaction publish failed (aside rename) for $idxDir")
    }
    if (!tmp.renameTo(dst)) {
      // restore the original tree before failing — the published path
      // must not stay absent
      aside.renameTo(dst)
      rm(tmp)
      sys.error(s"compaction publish failed (swap rename) for $idxDir")
    }
    rm(aside)
  }

  /** Idempotent-append guard for the streaming ingests: run `append`
    * only if micro-batch `epoch` has not already been applied to the
    * index at `idxDir`, and mark it applied afterwards. foreachBatch
    * re-runs a whole micro-batch with the SAME epoch id on
    * failure/restart, and a parquet append commits at JOB level (a
    * crashed append leaves only uncommitted _temporary files), so the
    * retry matrix is: crash mid-append → nothing committed, clean
    * re-append; crash after the marker → append skipped, the
    * epoch-keyed emit re-runs idempotently. The residual window —
    * a crash BETWEEN job commit and marker write — can duplicate one
    * epoch's appended rows; the substring and vector families absorb
    * even that (their reads are countDistinct/min/distinct-based),
    * the shingle family's intersection counts would not — which is
    * why the guard, not read-side distincts that would re-shuffle
    * corpus-scale state on every query, is the mechanism. Markers are
    * one empty file per epoch at the index root (underscore-prefixed:
    * invisible to Spark's file listing) and survive compact/refit
    * (republish carries them over). */
  def epochOnce(idxDir: String, epoch: Long)(append: => Unit): Unit = {
    val m = new java.io.File(idxDir, s"_GRAFT_EPOCH_$epoch")
    if (m.isFile) return
    append
    new java.io.File(idxDir).mkdirs() // first-ever append may create it
    java.nio.file.Files.write(m.toPath, Array.emptyByteArray)
  }

  /** Run `build` into a private dir and publish it at `idxDir` —
    * unless a complete index built under the SAME `key` is already
    * published there, in which case this is a no-op and the caller
    * reads the existing state. Specs that exercise the lifecycle
    * itself bypass this and call their build directly. */
  def buildOnce(idxDir: String, key: String)(build: String => Unit): Unit = {
    // an empty key would match a contentless pre-r9 marker (or a prior
    // empty-key publish) and freeze the index forever — every caller
    // must key to its source+format version
    require(key.nonEmpty, s"buildOnce requires a freshness key: $idxDir")
    val dst = new java.io.File(idxDir)
    if (publishedKey(dst).contains(key)) return
    val tmp = new java.io.File(
      idxDir + ".build-" + ProcessHandle.current.pid)
    rm(tmp) // a crashed same-pid build (pid reuse) must not pollute ours
    build(tmp.getPath)
    java.nio.file.Files.write(
      new java.io.File(tmp, Marker).toPath, key.getBytes("UTF-8"))
    // Re-check at publish time: a racer finishing first published an
    // equivalent index — keep theirs, never delete a complete
    // matching index out from under its readers (TOCTOU guard).
    if (publishedKey(dst).contains(key)) { rm(tmp); return }
    if (dst.exists()) {
      // stale key or crashed partial build: move it ASIDE first so
      // the published path never holds a half-deleted tree, then
      // delete the aside copy
      val aside = new java.io.File(
        idxDir + ".old-" + ProcessHandle.current.pid)
      rm(aside)
      if (dst.renameTo(aside)) rm(aside)
      else if (publishedKey(dst).contains(key)) { rm(tmp); return }
    }
    if (!tmp.renameTo(new java.io.File(idxDir))) {
      rm(tmp) // lost the race; the winner's index must be equivalent
      require(publishedKey(new java.io.File(idxDir)).contains(key),
        s"index publish failed and no matching winner exists: $idxDir")
    }
  }
}
