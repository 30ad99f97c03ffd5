package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file:` filesystem with fork-free chmod (r19 optimization).
  *
  * Without libhadoop's NativeIO, Hadoop's RawLocalFileSystem executes
  * an external `chmod` process for EVERY setPermission — and the
  * FileOutputCommitter calls it per created directory level on every
  * write job/task setup. The r19 profile showed `Shell.runCommand`
  * (fork+exec, ~5–10 ms each, serialized on the caller) on the driver
  * AND in tasks of every write-bearing query. This subclass performs
  * the same permission change through `Files.setPosixFilePermissions`
  * (one syscall); everything else — checksums, rename/link semantics,
  * the commit protocol — is inherited unchanged. Bits NIO cannot
  * express (setuid/setgid/sticky) fall back to the shell path, as does
  * any NIO failure, so behavior is identical in every case.
  *
  * Wired via `fs.file.impl` by every graft session builder; instanceof
  * checks against LocalFileSystem/RawLocalFileSystem (the manifest
  * publish link-based commit, atomicity gates) keep matching because
  * these ARE those types.
  */
class GraftLocalFileSystem extends LocalFileSystem(new GraftRawLocalFileSystem)

class GraftRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null || (permission.toShort & 0xE00) != 0) {
      super.setPermission(p, permission)
      return
    }
    import java.nio.file.attribute.PosixFilePermission._
    val bits = permission.toShort
    val perms = java.util.EnumSet.noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
    def add(bit: Int, perm: java.nio.file.attribute.PosixFilePermission): Unit =
      if ((bits & bit) != 0) { perms.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    try {
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
      ()
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}
