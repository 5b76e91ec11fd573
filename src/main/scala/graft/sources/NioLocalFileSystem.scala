package graft.sources

import java.nio.file.attribute.PosixFilePermission
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free permission handling for the local filesystem (r20, guide
  * §5/§7.3 "commit ... can be very slow with many files").
  *
  * Hadoop's `RawLocalFileSystem` applies permissions by FORKING a
  * `chmod` process whenever the libhadoop native library is absent —
  * and it applies them on EVERY file create and mkdir
  * (`LocalFSFileOutputStream.<init>` → `setPermission` →
  * `Shell.execCommand`). Spark distributions do not ship libhadoop, so
  * on a plain local deployment every written data file, ledger
  * manifest, checkpoint entry and state-store delta pays one
  * fork+exec. Measured this round: executor threads pinned in
  * `ProcessImpl.forkAndExec` under load, ~18 ms per fork when the host
  * is contended — a streaming micro-batch (offset log + commit log +
  * 8 state files) pays ~10 forks per batch, and a multi-append
  * pipeline pays one per segment + sidecar + manifest.
  *
  * The fix is semantics-preserving: the same permission bits are
  * applied through `java.nio.file.Files.setPosixFilePermissions` — one
  * fchmodat(2) syscall instead of a process. Special bits (setuid /
  * setgid / sticky), which POSIX attributes cannot express, fall back
  * to Hadoop's shell path; nothing in this engine writes them.
  *
  * Wired into every session by [[graft.Sessions.base]] through the two
  * public Hadoop extension points ([[https://hadoop.apache.org/docs/stable/hadoop-project-dist/hadoop-common/core-default.xml
  * fs.file.impl]] for the `FileSystem` API and
  * `fs.AbstractFileSystem.file.impl` for the `FileContext` API that
  * Structured Streaming's checkpoint manager uses). On a real cluster
  * the same classes apply to executor-local spill/shuffle dirs only;
  * HDFS/object-store schemes are untouched — this optimizes the local
  * scheme, it does not change where data goes at 100 TB.
  */
final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val bits = permission.toShort.toInt
    if ((bits & 0xE00) != 0) { // setuid/setgid/sticky: NIO can't express
      super.setPermission(p, permission)
      return
    }
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    import PosixFilePermission._
    val table = Seq(
      OWNER_READ -> 0x100, OWNER_WRITE -> 0x80, OWNER_EXECUTE -> 0x40,
      GROUP_READ -> 0x20, GROUP_WRITE -> 0x10, GROUP_EXECUTE -> 0x8,
      OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2, OTHERS_EXECUTE -> 0x1)
    table.foreach { case (pp, mask) => if ((bits & mask) != 0) perms.add(pp) }
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    catch {
      case _: UnsupportedOperationException =>
        // non-POSIX store (never on Linux): keep Hadoop's behavior
        super.setPermission(p, permission)
      case e: java.nio.file.NoSuchFileException =>
        // match Shell chmod's contract: missing target is an IOException
        throw new java.io.IOException(
          s"setPermission: ${e.getFile} does not exist")
    }
  }
}

/** `file://` FileSystem with fork-free permissions — same checksummed
  * semantics as Hadoop's [[LocalFileSystem]] (`.crc` sidecars intact),
  * only the raw delegate's `setPermission` differs. */
final class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `FileContext` (AbstractFileSystem) twin — what Structured
  * Streaming's default checkpoint file manager resolves for `file://`.
  * Mirrors Hadoop's `local.RawLocalFs` shape. Instantiated reflectively
  * via the (URI, Configuration) constructor `AbstractFileSystem`
  * requires. */
final class NioRawLocalFs(uri: java.net.URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf, "file", false)

/** Checksummed `file://` AbstractFileSystem over the fork-free raw fs —
  * mirrors Hadoop's `local.LocalFs` (ChecksumFs over RawLocalFs). */
final class NioLocalFs(uri: java.net.URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))
