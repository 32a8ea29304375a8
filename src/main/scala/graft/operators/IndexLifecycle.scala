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
  * All filesystem access goes through [[LakeFs]], so index dirs may
  * live on local disk, HDFS, or an object store. Publish is by
  * rename of a process-private build dir: atomic on HDFS/local; on
  * object stores rename degrades to copy+delete (see LakeFs's
  * contract), which widens the swap's not-atomic window — readers
  * holding open objects are unaffected (immutable objects), but a
  * LISTING mid-swap can see a partial tree, so on S3-class stores
  * prefer republishing indexes as snapshot versions (write-then-
  * marker) when multi-reader listings matter. Two processes racing
  * build equivalent indexes and one rename wins — never a
  * half-overwritten hybrid under a marker. The stale previous dir is
  * renamed ASIDE before deletion and the marker is re-checked
  * immediately before that move (the r8 ADVICE TOCTOU finding: a
  * racer may have published a complete index between our freshness
  * check and our publish — deleting it would orphan the racer's
  * lazily-evaluated readers mid-scan).
  */
object IndexLifecycle {

  private val Marker = "_GRAFT_INDEX_COMPLETE"

  /** The key the published index at `dir` was built under, if its
    * marker exists. A contentless marker (pre-r9 layout) reads as ""
    * and matches no key — legacy indexes rebuild once. */
  private def publishedKey(dir: String): Option[String] =
    LakeFs.readString(s"$dir/$Marker").map(_.trim)

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
    * path, length, and mtime — any rewrite of any part changes it.
    * (On object stores mtime is the PUT time of the immutable object,
    * which versions exactly as well as a local mtime.) */
  def sourceKey(srcPath: String, fmt: String): String =
    LakeFs.status(srcPath) match {
      case Some(st) if st.isFile =>
        s"${st.getLen}-${st.getModificationTime}-$fmt"
      case Some(st) if st.isDirectory =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val rootLen = st.getPath.toString.length
        LakeFs.leaves(srcPath)
          .map(l => (l.getPath.toString.drop(rootLen), l))
          .sortBy(_._1)
          .foreach { case (rel, l) =>
            // RELATIVE path, not basename: moving a same-named file
            // between partition subdirs must change the key
            md.update(
              s"$rel:${l.getLen}:${l.getModificationTime}|".getBytes("UTF-8"))
          }
        val hex = md.digest().take(8).map("%02x".format(_)).mkString
        s"d$hex-$fmt"
      case _ => s"absent-$fmt" // build runs and fails with the real error
    }

  /** In-place maintenance publish (compaction): run `rewrite` into a
    * process-private dir, carry the freshness marker over unchanged
    * (compaction changes the LAYOUT, not the logical content a key
    * describes), and swap by rename — the old tree goes ASIDE first,
    * then the rewritten tree renames in. The published path is absent
    * only for the instant between those two renames (a truly atomic
    * directory SWAP exists on no filesystem Spark targets); open
    * readers keep their handles on the aside copy until it is reaped.
    *
    * Race guard: the marker is captured BEFORE the rewrite reads any
    * state and compared again at swap time — if a concurrent
    * buildOnce republished under a different key mid-compaction (the
    * source changed under us), this compaction's output describes
    * superseded state, so it ABORTS and leaves the racer's fresh
    * index in place rather than stamping old content with a new key. */
  def republish(idxDir: String)(rewrite: String => Unit): Unit = {
    val pid = ProcessHandle.current.pid
    val keyAtStart = publishedKey(idxDir)
    val tmp = s"$idxDir.compact-$pid"
    LakeFs.rmTree(tmp)
    rewrite(tmp)
    keyAtStart.foreach(k => LakeFs.write(s"$tmp/$Marker", k))
    // applied-epoch markers describe ingest HISTORY, not layout —
    // losing them across a compact/refit would re-open the
    // at-least-once window for any in-flight epoch retry. A marker
    // vanishing mid-copy means a racer republished under us; the
    // superseded check below aborts then, so skipping it is safe.
    LakeFs.list(idxDir)
      .filter(_.getPath.getName.startsWith("_GRAFT_EPOCH_"))
      .foreach { st =>
        val name = st.getPath.getName
        LakeFs.readString(st.getPath.toString)
          .foreach(c => LakeFs.write(s"$tmp/$name", c))
      }
    if (publishedKey(idxDir) != keyAtStart) {
      LakeFs.rmTree(tmp); return // superseded
    }
    val aside = s"$idxDir.old-$pid"
    LakeFs.rmTree(aside)
    if (!LakeFs.rename(idxDir, aside)) {
      LakeFs.rmTree(tmp) // never leak an index-sized build dir
      sys.error(s"compaction publish failed (aside rename) for $idxDir")
    }
    if (!LakeFs.rename(tmp, idxDir)) {
      // restore the original tree before failing — the published path
      // must not stay absent
      LakeFs.rename(aside, idxDir)
      LakeFs.rmTree(tmp)
      sys.error(s"compaction publish failed (swap rename) for $idxDir")
    }
    LakeFs.rmTree(aside)
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
    val m = s"$idxDir/_GRAFT_EPOCH_$epoch"
    if (LakeFs.isFile(m)) return
    append
    LakeFs.mkdirs(idxDir) // first-ever append may create it
    LakeFs.write(m, "")
  }

  /** [[epochOnce]] scoped to one named producer: epoch ids are
    * per-query counters, so when SEVERAL streams feed one root (the
    * multi-writer ingest, Snapshots.publishConcurrent) each stream's
    * epoch 0 is a different fact — the marker carries the stream id
    * (`_GRAFT_EPOCH_<streamId>_<epoch>`). Retention reaps these per
    * stream (Snapshots' vacuum family parses the id back off the
    * name — everything up to the final underscore). */
  def epochOnceFor(idxDir: String, streamId: String, epoch: Long)(
      append: => Unit): Unit = {
    require(streamId.matches("[A-Za-z0-9_-]+"),
      s"streamId must be [A-Za-z0-9_-]+: '$streamId'")
    val m = s"$idxDir/_GRAFT_EPOCH_${streamId}_$epoch"
    if (LakeFs.isFile(m)) return
    append
    LakeFs.mkdirs(idxDir)
    LakeFs.write(m, "")
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
    if (publishedKey(idxDir).contains(key)) return
    val tmp = idxDir + ".build-" + ProcessHandle.current.pid
    LakeFs.rmTree(tmp) // a crashed same-pid build (pid reuse) must not pollute ours
    build(tmp)
    LakeFs.write(s"$tmp/$Marker", key)
    // Re-check at publish time: a racer finishing first published an
    // equivalent index — keep theirs, never delete a complete
    // matching index out from under its readers (TOCTOU guard).
    if (publishedKey(idxDir).contains(key)) { LakeFs.rmTree(tmp); return }
    if (LakeFs.exists(idxDir)) {
      // stale key or crashed partial build: move it ASIDE first so
      // the published path never holds a half-deleted tree, then
      // delete the aside copy
      val aside = idxDir + ".old-" + ProcessHandle.current.pid
      LakeFs.rmTree(aside)
      if (LakeFs.rename(idxDir, aside)) LakeFs.rmTree(aside)
      else if (publishedKey(idxDir).contains(key)) {
        LakeFs.rmTree(tmp); return
      }
    }
    if (!LakeFs.rename(tmp, idxDir)) {
      LakeFs.rmTree(tmp) // lost the race; the winner's index must be equivalent
      require(publishedKey(idxDir).contains(key),
        s"index publish failed and no matching winner exists: $idxDir")
    }
  }
}
