package graft.sources

/** The commit protocol's filesystem boundary (verdict r17 #4): the
  * THREE primitives [[GraftVersions]]' optimistic-concurrency design
  * actually relies on, isolated so the POSIX implementation is visibly
  * one of several. Everything above this seam — manifest chaining,
  * version arithmetic, tombstone semantics, retry loops — is
  * filesystem-agnostic; everything below it is what a deployment must
  * re-provide for storage with different atomicity guarantees.
  *
  * Per-primitive contracts (what an HDFS/S3 implementation needs):
  *
  *  - [[publishIfAbsent]] — the COMMIT POINT. Atomic create-if-absent:
  *    exactly one of N concurrent callers for the same target returns
  *    true; no caller may ever observe a partially-written target.
  *    POSIX: hard-link publish of a fully-written temp file
  *    (`Files.createLink` fails atomically on an existing target).
  *    HDFS: `FileSystem.create(path, overwrite = false)` has the same
  *    win-exactly-once contract (rename-based commit also works). S3:
  *    conditional PUT with `If-None-Match: *` (supported since 2024),
  *    or an external test-and-set (the DynamoDB commit service Delta
  *    uses) — plain S3 PUT is last-writer-wins and CANNOT provide
  *    this primitive alone.
  *
  *  - [[atomicOverwrite]] — pointer flip / tombstone write. Replace
  *    the target's content so any concurrent reader sees the OLD
  *    bytes or the NEW bytes, never a torn or empty file. POSIX:
  *    write-temp + `ATOMIC_MOVE` rename. HDFS: temp + overwriting
  *    rename (atomic within a directory). S3: a plain PUT is already
  *    atomic per-object (readers see old or new version) — but
  *    read-after-overwrite consistency must be checked per store.
  *
  *  - [[withTableLock]] — cross-process mutual exclusion for the
  *    pointer/ledger critical section (commit-instant append + flip
  *    ordering). POSIX: an OS `FileChannel` lock, with a JVM-global
  *    mutex underneath because `FileChannel.lock` throws on same-JVM
  *    overlap. HDFS: lease-based lock file or coordination service.
  *    S3: no native lock — a DynamoDB/ZooKeeper mutex, or restructure
  *    the pointer as a versioned object with conditional writes.
  *
  *  - [[appendLine]] — commit-instant ledger append (only ever called
  *    INSIDE [[withTableLock]], so it needs no atomicity of its own —
  *    just durability). Object stores without append re-express the
  *    ledger as one object per commit instant.
  */
private[graft] trait GraftCommitIo {
  /** Atomically publish `content` at `target` iff no file exists
    * there. True iff THIS caller created it (won the version). */
  def publishIfAbsent(target: java.io.File, content: Array[Byte]): Boolean

  /** Atomically replace `target`'s content — concurrent readers see
    * the old or the new bytes, never a torn write. */
  def atomicOverwrite(target: java.io.File, content: Array[Byte]): Unit

  /** Run `body` under a cross-process exclusive lock rooted at
    * `lockFile` (created if absent). Reentrancy is NOT required —
    * callers never nest. */
  def withTableLock[T](lockFile: java.io.File)(body: => T): T

  /** Append one line to `target` (created if absent). Callers hold
    * [[withTableLock]]; durability, not atomicity, is the contract. */
  def appendLine(target: java.io.File, line: String): Unit
}

/** The POSIX-filesystem implementation — correct on any filesystem
  * with POSIX link/rename/flock semantics (local disk, NFS with
  * working locks). Race-proven by MergeSpec's 20-round commit races;
  * the contracts above are exactly what those gates exercise. */
private[graft] object PosixCommitIo extends GraftCommitIo {

  override def publishIfAbsent(target: java.io.File,
      content: Array[Byte]): Boolean = {
    target.getParentFile.mkdirs()
    // fully write a temp sibling, then hard-link it into place: the
    // link either creates the target (atomically, content complete)
    // or fails because someone else won — no observable intermediate
    val tmp = new java.io.File(target.getParentFile,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    java.nio.file.Files.write(tmp.toPath, content)
    try {
      java.nio.file.Files.createLink(target.toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      tmp.delete()
      ()
    }
  }

  override def atomicOverwrite(target: java.io.File,
      content: Array[Byte]): Unit = {
    val tmp = new java.io.File(target.getParentFile,
      s".ow-${java.util.UUID.randomUUID().toString.take(12)}")
    java.nio.file.Files.write(tmp.toPath, content)
    java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** One lock object per JVM: `FileChannel.lock` throws
    * OverlappingFileLockException for same-JVM contention, so
    * intra-process serialization happens here and the file lock
    * covers cross-process racers. */
  private val jvmMutex = new Object

  override def withTableLock[T](lockFile: java.io.File)(body: => T): T =
    jvmMutex.synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val l = ch.lock()
      try body
      finally { l.release(); ch.close() }
    }

  override def appendLine(target: java.io.File, line: String): Unit = {
    java.nio.file.Files.write(target.toPath, (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }
}
