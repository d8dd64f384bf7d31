package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** The atomicity seam of the optimistic commit protocol (reference:
  * FileStoreCommitImpl.java:89-101 — the reference likewise isolates
  * "publish snapshot-N exactly once" behind its FileIO so object stores can
  * substitute their own primitive).
  *
  * Contract of [[putIfAbsent]] — everything ACID in the table rests on it:
  *
  *  1. '''Exclusive''': of N concurrent callers for the same `target`, at
  *     most one returns true; all others return false. A false return means
  *     a racing committer won and the caller must re-plan against the new
  *     latest snapshot (never blindly retry the same id).
  *  1. '''Atomic''': readers never observe a partially written object at
  *     `target` — it is absent, then complete.
  *  1. '''Durable''': a true return means the object survives process
  *     death (close/flush before publish).
  *
  * Implementations:
  *  - [[RenameCommitStore]] (shipped): filesystems with an atomic
  *    fail-if-exists primitive — HDFS `rename`, local-FS hard link.
  *  - Object stores (documented seam, not shipped — the sandbox has no
  *    object store to test against): S3-class stores provide the contract
  *    directly via conditional PUT (`If-None-Match: *`, supported on S3
  *    since 2024, GCS `x-goog-if-generation-match: 0`, ABFS ETag
  *    preconditions) — implement [[putIfAbsent]] as one conditional PUT and
  *    map the 412 precondition failure to `false`. Stores without
  *    conditional writes need an external mutex (e.g. a DynamoDB/JDBC
  *    lock table keyed by table path, as the reference's catalog lock
  *    does) held across an existence check + put.
  */
trait CommitStore {
  /** Publish `content` at `target` iff nothing exists there. */
  def putIfAbsent(target: Path, content: String): Boolean
}

/** Rename-based [[CommitStore]] for HDFS-semantics filesystems: write a
  * temp file in the target's directory, then promote it with the
  * filesystem's atomic fail-if-exists primitive. On the local filesystem
  * that primitive is hard-link creation — POSIX rename(2) silently
  * REPLACES an existing destination, so two racing committers would both
  * think they won and one snapshot would be lost (found by
  * ConcurrencySpec); HDFS-like stores refuse the rename instead.
  */
object CommitStore {
  /** Select the impl by `graft.commit-store` in the Hadoop conf:
    * `rename` (default) or `lock`. The seam point for object-store
    * deployments — a conditional-PUT impl plugs in the same way.
    */
  def forConf(conf: org.apache.hadoop.conf.Configuration,
      fsOf: () => FileSystem): CommitStore =
    conf.get("graft.commit-store", "rename") match {
      case "rename" => new RenameCommitStore(fsOf)
      case "lock" => new LockFileCommitStore(fsOf,
        conf.getLong("graft.commit-store.lock-ttl-ms", 10 * 60 * 1000L))
      case other => throw new IllegalArgumentException(
        s"unknown graft.commit-store: $other (expected rename or lock)")
    }
}

class RenameCommitStore(fsOf: () => FileSystem) extends CommitStore {
  override def putIfAbsent(target: Path, content: String): Boolean = {
    val fs = fsOf()
    if (fs.exists(target)) return false
    val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID()}.tmp")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val ok = try {
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        fs.rename(tmp, target)
      }
    } catch { case _: java.io.IOException => false }
    fs.delete(tmp, false) // no-op when the rename path consumed it
    ok
  }
}

/** Mutex-emulation [[CommitStore]] for stores WITHOUT an atomic
  * fail-if-exists publish (the reference's catalog-lock strategy:
  * `catalog.lock-enabled` backing FileSystemCatalog commits with an
  * external lock, CatalogLock.java): a per-target lock object is created
  * with an atomic create-exclusive primitive, and the existence-check +
  * put of the real object happen under that mutex — so the put itself can
  * be a plain overwrite-free write+rename without racing anybody.
  *
  * Lock objects carry their creation time; a lock older than `ttlMs`
  * (a crashed committer) is broken once and acquisition retried. Losing
  * the race for the LOCK is reported as losing the commit (`false`) —
  * the caller's optimistic retry loop re-plans against the new latest
  * snapshot, which is the same observable behavior as losing a
  * conditional PUT.
  */
class LockFileCommitStore(fsOf: () => FileSystem,
    ttlMs: Long = 10 * 60 * 1000L) extends CommitStore {

  private def tryLock(fs: FileSystem, lock: Path): Boolean =
    try {
      if (fs.getScheme == "file") {
        // RawLocalFileSystem.create(overwrite=false) is check-then-create
        // (TOCTOU); POSIX CREATE_NEW is the real atomic primitive locally
        java.nio.file.Files.write(
          java.nio.file.Paths.get(lock.toUri.getPath),
          String.valueOf(System.currentTimeMillis()).getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } else {
        // HDFS-class create(overwrite=false) is atomic in the NameNode
        val out = fs.create(lock, false)
        try out.write(String.valueOf(System.currentTimeMillis())
          .getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException => false
    }

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val fs = fsOf()
    if (fs.exists(target)) return false
    fs.mkdirs(target.getParent)
    val lock = new Path(target.getParent, s".${target.getName}.lock")
    var locked = tryLock(fs, lock)
    if (!locked) {
      // break a stale lock (crashed holder) exactly once, then re-race
      val stale = try {
        val st = fs.getFileStatus(lock)
        System.currentTimeMillis() - st.getModificationTime > ttlMs
      } catch { case _: java.io.IOException => false }
      if (stale) {
        fs.delete(lock, false)
        locked = tryLock(fs, lock)
      }
    }
    if (!locked) return false
    try {
      // under the mutex: nobody else writes `target`, so check + publish
      // is race-free; write-then-rename keeps readers from seeing a
      // partial object (rename may overwrite — we own the name)
      if (fs.exists(target)) return false
      val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val ok = try fs.rename(tmp, target) catch { case _: java.io.IOException => false }
      if (!ok) fs.delete(tmp, false)
      ok
    } finally fs.delete(lock, false)
  }
}
