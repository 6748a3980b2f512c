package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The `graftfs:` scheme's [[org.apache.hadoop.fs.AbstractFileSystem]]
  * binding (`fs.AbstractFileSystem.graftfs.impl`), so
  * [[org.apache.hadoop.fs.FileContext]] — the API
  * `graft.sources.HadoopFsCommitIo` is written against — can resolve
  * it. Wraps [[GraftTestFs]]'s local backing and overrides ONE method:
  * the rename kernel, to honor the HDFS rename contracts the commit
  * recipes rely on with REAL atomicity on local disk:
  *
  *  - no-overwrite rename fails atomically iff the destination exists
  *    (on HDFS the exists-check + rename are one NameNode op; locally
  *    that is `link(2)` — EEXIST is atomic — then unlink of the
  *    source, the PosixCommitIo trick). The default AbstractFileSystem
  *    path is check-then-act, whose TOCTOU window would make the
  *    20-round commit races flaky rather than a proof.
  *  - `Options.Rename.OVERWRITE` rename replaces atomically (HDFS: one
  *    NN op; locally: `rename(2)` via ATOMIC_MOVE + REPLACE_EXISTING).
  *    The default path is delete-then-rename — a visible gap.
  *
  * Directories fall through to the delegate (the commit recipes only
  * rename files). */
class GraftTestAbstractFs(uri: java.net.URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new GraftTestFs(), conf, "graftfs", false) {

  private def local(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  override def renameInternal(src: Path, dst: Path,
      overwrite: Boolean): Unit = {
    val s = local(src)
    if (java.nio.file.Files.isDirectory(s)) {
      super.renameInternal(src, dst, overwrite)
      return
    }
    val d = local(dst)
    if (overwrite) {
      java.nio.file.Files.move(s, d,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } else {
      try {
        java.nio.file.Files.createLink(d, s)
        java.nio.file.Files.delete(s)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"rename destination exists: $dst")
      }
    }
  }

  override def renameInternal(src: Path, dst: Path): Unit =
    renameInternal(src, dst, overwrite = false)
}
