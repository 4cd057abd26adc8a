package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}

/** Filesystem seam for the store maintenance layer — every lock,
  * manifest, listing, version dir, tombstone, and sidecar check goes
  * through the Hadoop [[FileSystem]] API (public, ships with Spark),
  * so the entire lifecycle (compact/purge/vacuum/retrain/readBefore/
  * versionedAppend/locking) runs unchanged on `file://`, HDFS, or any
  * Hadoop-compatible store. The reference has no equivalent (it is a
  * single-process FAISS demo persisting to the local disk,
  * /root/reference/build_faiss_db.py:218-226); at 100 TB the store
  * lives on a cluster filesystem and `java.io.File` simply does not
  * reach it — this seam is what makes the maintenance contract
  * portable.
  *
  * == Atomicity contract by scheme ==
  *
  *  - `file://` — create-exclusive uses `java.nio` `CREATE_NEW`
  *    (truly atomic; Hadoop's RawLocalFileSystem `create(overwrite =
  *    false)` is exists-then-create and can double-acquire under
  *    contention, which the version-allocation spin lock cannot
  *    tolerate). Renames are POSIX atomic.
  *  - HDFS — `create(path, overwrite=false)` is atomic at the
  *    NameNode; directory rename is atomic. Full contract holds.
  *  - S3A — rename is copy+delete (NOT atomic) and create-exclusive
  *    is best-effort. The swap protocol's crash windows widen from
  *    "none" to "the duration of the copy"; [[StoreMaintenance
  *    .recover]] still settles every outcome because the manifest is
  *    the commit point, but OPERATORS MUST serialize maintainers
  *    externally (the lock is advisory there). This is the documented
  *    Delta-on-S3 caveat and carries over verbatim.
  */
private[graft] object StoreFs {

  /** Active Hadoop configuration: the session's (so `fs.defaultFS`,
    * credentials, and per-bucket settings apply), or a vanilla one
    * when no session exists (pure-path utilities in tests).
    */
  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Resolve a store path string against its filesystem (relative
    * local paths qualify against the working directory, URIs against
    * their scheme's FS).
    */
  def qualified(path: String): Path = {
    val p = new Path(path)
    p.getFileSystem(conf).makeQualified(p)
  }

  def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  /** Directory-listing counter — the observability hook the
    * O(touched-dirs) append contract is spec'd against (the Round9
    * job-counting pattern, applied to listings): tests snapshot it
    * around an append and assert the listing count scales with the
    * dirs the append touched, not the store's partition count.
    */
  val listings = new java.util.concurrent.atomic.AtomicLong(0)

  /** Per-thread listing counter backing [[countListings]] — the
    * maintenance layer lists directories on the calling thread, so a
    * thread-local delta attributes listings to one store operation
    * even when parallel suites (or listener-driven store reads) bump
    * the global counter concurrently.
    */
  private val tlListings = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** Run `body` and return (result, directory listings IT performed on
    * this thread) — the race-free way to assert the O(touched-dirs)
    * contract (snapshotting the process-global [[listings]] counter is
    * flaky under parallel test execution).
    */
  def countListings[T](body: => T): (T, Long) = {
    val start = tlListings.get()
    val r = body
    (r, tlListings.get() - start)
  }

  /** List a directory's immediate children; a missing dir lists
    * empty (the `Option(listFiles()).getOrElse(empty)` idiom).
    * Checksum sidecars (`.crc`) are invisible here by construction —
    * ChecksumFileSystem filters them — which is why the maintenance
    * layer no longer handles them by hand.
    */
  def list(fs: FileSystem, d: Path): Array[FileStatus] = {
    listings.incrementAndGet()
    tlListings.set(tlListings.get() + 1)
    try fs.listStatus(d)
    catch { case _: java.io.FileNotFoundException => Array.empty }
  }

  def exists(fs: FileSystem, p: Path): Boolean = fs.exists(p)

  /** Existence check for a store artifact by path string — the
    * sidecar-presence probe (`.books`, `.codes`, `.driftstats`,
    * `.dlbuckets`) every build-once gate and maintainer runs.
    */
  def exists(path: String): Boolean = {
    val p = qualified(path)
    fsOf(p).exists(p)
  }

  /** Absolutize a HARNESS work path (build-once gate caches, streamed
    * store roots, fixture dirs) against the active filesystem — the
    * qualified URI string. Replaces `new java.io.File(p)
    * .getAbsolutePath` in the gate harness: on a local session this
    * resolves to the same target/ directory (file: scheme), on a
    * cluster session the caches land on fs.defaultFS instead of
    * silently binding to the driver's local disk.
    */
  def workPath(path: String): String = qualified(path).toString

  /** mkdirs by path string (harness out-dirs). */
  def mkdirs(path: String): Boolean = {
    val p = qualified(path)
    fsOf(p).mkdirs(p)
  }

  def isFile(fs: FileSystem, p: Path): Boolean =
    try fs.getFileStatus(p).isFile
    catch { case _: java.io.FileNotFoundException => false }

  def isDir(fs: FileSystem, p: Path): Boolean =
    try fs.getFileStatus(p).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  def mkdirs(fs: FileSystem, p: Path): Boolean = fs.mkdirs(p)

  /** Recursive delete; missing path is a no-op (java.io semantics). */
  def delete(fs: FileSystem, p: Path): Boolean =
    try fs.delete(p, true)
    catch { case _: java.io.FileNotFoundException => false }

  def mtime(fs: FileSystem, p: Path): Long =
    try fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }

  def writeLines(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Atomic create-exclusive: true = created (holding the lock),
    * false = already exists. See the scheme contract in the object
    * doc — local paths take the `java.nio` CREATE_NEW fast path so
    * same-host maintainers (and the in-JVM version-allocation spin)
    * keep genuinely atomic acquisition; cluster schemes use
    * `FileSystem.create(path, overwrite = false)`, atomic on HDFS.
    */
  def createExclusive(fs: FileSystem, p: Path, lines: Seq[String]): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.util.Arrays.asList(lines: _*),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        // an RPC-wrapped exists-contention carries the server-side
        // class name; HDFS lease conflicts (another writer mid-create)
        // are contention too. Anything else — permission, quota,
        // missing parent ("Parent path does not exist" also contains
        // 'xist'!) — is a REAL I/O failure and must propagate, not be
        // misreported as "store is locked by holder '?'" (whose
        // runbook is breakLock+recover)
        case e: org.apache.hadoop.ipc.RemoteException
            if Option(e.getClassName).exists(c =>
              c.endsWith("FileAlreadyExistsException") ||
                c.endsWith("AlreadyBeingCreatedException")) => false
      }
    }

  /** File move with replace-existing semantics (the swap protocol's
    * idempotent re-run: a re-completed manifest step may find its
    * destination already moved). Non-atomic when dst exists (delete
    * then rename) — safe here because every caller is manifest-driven
    * and re-runnable.
    */
  def moveReplace(fs: FileSystem, src: Path, dst: Path): Unit = {
    if (fs.exists(dst)) fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  /** Directory rename as a commit point (versionedAppend's staged
    * record): atomic on local and HDFS; the S3A caveat is documented
    * on the object.
    */
  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename $src -> $dst failed")

  def copyFile(fs: FileSystem, src: Path, dst: Path): Unit = {
    FileUtil.copy(fs, src, fs, dst, false, true, conf); ()
  }
}
