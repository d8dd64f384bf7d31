package graft.spark

import java.net.URI
import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** RawLocalFileSystem with permission changes done through java.nio
  * instead of Hadoop's fork+exec `chmod` fallback (the image ships no
  * native-hadoop library, so stock Hadoop spawns a process per created
  * file and per mkdir).
  */
private[spark] class NioRawLocalFileSystem extends RawLocalFileSystem {
  // RawLocalFileSystem does not override getScheme (LocalFileSystem does);
  // callers like RenameCommitStore key their atomic-link fast path on it
  override def getScheme: String = "file"

  private[this] val posixBits = Array(
    PosixFilePermission.OTHERS_EXECUTE, PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE, PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE, PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ)

  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val bits: Int = permission.toShort.toInt
    var i = 0
    while (i < 9) {
      if ((bits & (1 << i)) != 0) perms.add(posixBits(i))
      i += 1
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
  }
}

/** Local `file:` FileSystem for JVMs without the native-hadoop library:
  * a LocalFileSystem (so `FileSystem.getLocal`'s cast keeps working)
  * whose raw layer does permissions via java.nio instead of forking
  * `chmod`, and whose checksum twin files are off.
  *
  * Why (OPTIMIZATION_r19.md, measured by jstack sampling of the bench):
  * without libhadoop, `RawLocalFileSystem.setPermission` shells out — one
  * process spawn per created file AND per created directory — and the
  * stock checksum layer additionally doubles every create with a `.crc`
  * twin (whose create forks again). A small-batch commit staging C files
  * paid ~2C forks + 2C creates of pure fixed cost; an IVF-index append
  * leg (16 cell dirs) measured 7× a plain append on identical rows, with
  * `ProcessImpl.forkAndExec` and `FileOutputStream.open0` dominating the
  * samples. Neither cost exists on the HDFS/S3A deployments this engine
  * targets at 100 TB — this class restores local-FS behavior to
  * production shape rather than tuning for the bench host.
  *
  * Behavior notes: permission bits map 1:1 onto PosixFilePermissions
  * (setuid/setgid/sticky, which java.nio cannot express, are dropped —
  * the engine never sets them); `.crc` files are neither written nor
  * verified, matching object-store deployments where integrity lives in
  * the store. Pre-existing `.crc` files from stock sessions are simply
  * ignored.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem) {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

object NioLocalFileSystem {
  /** Hadoop conf key + value installing this FS for the `file:` scheme. */
  val ConfKey = "fs.file.impl"
  val ConfValue: String = classOf[NioLocalFileSystem].getName
}
