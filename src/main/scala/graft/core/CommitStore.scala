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
