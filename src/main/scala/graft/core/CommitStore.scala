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
    * `rename` (default), `lock`, or `conditional-put` (object stores; the
    * client class comes from `graft.commit-store.put-client`, defaulting
    * to the local CREATE_NEW-backed emulation).
    */
  def forConf(conf: org.apache.hadoop.conf.Configuration,
      fsOf: () => FileSystem): CommitStore =
    conf.get("graft.commit-store", "rename") match {
      case "rename" => new RenameCommitStore(fsOf)
      case "lock" => new LockFileCommitStore(fsOf,
        conf.getLong("graft.commit-store.lock-ttl-ms", 10 * 60 * 1000L))
      case "conditional-put" =>
        val clientCls = conf.get("graft.commit-store.put-client",
          classOf[LocalConditionalPutClient].getName)
        new ConditionalPutCommitStore(Class.forName(clientCls)
          .getDeclaredConstructor().newInstance()
          .asInstanceOf[ConditionalPutClient])
      case other => throw new IllegalArgumentException(
        s"unknown graft.commit-store: $other (expected rename, lock, or conditional-put)")
    }
}

/** Storage SPI for object stores with conditional writes: ONE call
  * publishes the complete object iff nothing exists at `target`. S3 maps
  * this to `PUT` + `If-None-Match: *` (412 → false), GCS to
  * `x-goog-if-generation-match: 0`, ABFS to an ETag precondition — the
  * store's server side provides the exclusive+atomic+durable contract, so
  * the commit store is a one-line adapter (this is the reference's
  * object-store FileIO shape). Implementations must be no-arg
  * constructible (selected by class name via
  * `graft.commit-store.put-client`).
  */
trait ConditionalPutClient {
  /** Publish `content` at `target` iff absent; false on precondition
    * failure. `target` is the full URI/path string of the object.
    */
  def putIfAbsent(target: String, content: Array[Byte]): Boolean
}

/** [[CommitStore]] over a [[ConditionalPutClient]]: the entire contract is
  * the store's single conditional-put primitive — no rename, no lock
  * object, no existence pre-check (the precondition IS the check; a
  * pre-check would just widen the race for no benefit and cost a round
  * trip per commit).
  */
class ConditionalPutCommitStore(client: ConditionalPutClient) extends CommitStore {
  override def putIfAbsent(target: Path, content: String): Boolean =
    client.putIfAbsent(target.toString,
      content.getBytes(StandardCharsets.UTF_8))
}

/** Local emulation of S3-class conditional-put semantics, standing in for
  * the store's server-side atomicity so the seam is provable under races
  * without an object store: the object body is staged fully, then
  * published with hard-link creation (atomic fail-if-exists — readers see
  * absent, then complete, exactly the conditional-PUT observable
  * behavior). Works cross-process, not just cross-thread.
  */
class LocalConditionalPutClient extends ConditionalPutClient {
  override def putIfAbsent(target: String, content: Array[Byte]): Boolean = {
    val uri = java.net.URI.create(target)
    val p = java.nio.file.Paths.get(
      if (uri.getScheme == null) target else uri.getPath).toAbsolutePath
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".${p.getFileName}.${UUID.randomUUID()}.cput")
    // the staged write sits INSIDE the cleanup scope: a failed write
    // (disk full) must not leak a partial .cput file per attempt
    try {
      java.nio.file.Files.write(tmp, content)
      java.nio.file.Files.createLink(p, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally java.nio.file.Files.deleteIfExists(tmp)
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
  * '''Ownership''': every lock object carries its holder's per-call UUID
  * token; holders re-read the lock and verify their token immediately
  * before publishing, so a holder whose lock was yanked ABORTS (returns
  * false) instead of double-publishing.
  *
  * '''Stale-break protocol''' (crashed committer = lock older than
  * `ttlMs`): breakers are serialized through a secondary `.breaker` lock
  * so at most one breaker acts at a time, and the break itself is
  * CONDITIONAL — under the breaker mutex the main lock is re-read and
  * deleted only if it still holds the exact token the breaker observed as
  * stale. A fresh lock re-created by a faster breaker therefore survives
  * (tokens are UUIDs — same token ⇒ same lock instance). Losing the race
  * for either lock is reported as losing the commit (`false`) — the
  * caller's optimistic retry loop re-plans against the new latest
  * snapshot, the same observable behavior as losing a conditional PUT.
  *
  * Each successful break appends a telemetry record under
  * `.lock-events/` beside the lock (broken token, age, breaker token) —
  * surfaced by the `$locks` system table so operators can see lock
  * contention/crash recovery before it becomes an availability problem.
  *
  * '''Residual lease window (lease-without-fencing limit)''': the
  * verify-before-publish re-read closes the practical race, but between
  * `stillOwn`'s re-read and the publishing `rename` there is an
  * unavoidable window in which a holder stalled LONGER than `ttlMs`
  * (GC pause, NFS hang) can be broken and overwritten — plain
  * filesystems offer no storage-side fencing token to close it. Size
  * `ttlMs` ≫ the longest plausible holder stall (the 10-min default
  * assumes single-digit-minute worst-case pauses; raise it on storage
  * with minute-scale hiccups). The default rename-based store is
  * unaffected — prefer it wherever rename is atomic.
  */
class LockFileCommitStore(fsOf: () => FileSystem,
    ttlMs: Long = 10 * 60 * 1000L) extends CommitStore {

  /** Create `lock` exclusively with `token` as its content. */
  private def tryLock(fs: FileSystem, lock: Path, token: String): Boolean =
    try {
      if (fs.getScheme == "file") {
        // RawLocalFileSystem.create(overwrite=false) is check-then-create
        // (TOCTOU); POSIX CREATE_NEW is the real atomic primitive locally
        java.nio.file.Files.write(
          java.nio.file.Paths.get(lock.toUri.getPath),
          token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } else {
        // HDFS-class create(overwrite=false) is atomic in the NameNode
        val out = fs.create(lock, false)
        try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException => false
    }

  /** The lock's current holder token, or None if absent/unreadable. */
  private def readToken(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      val buf = new java.io.ByteArrayOutputStream()
      try {
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      } finally in.close()
      Some(new String(buf.toByteArray, StandardCharsets.UTF_8))
    } catch { case _: java.io.IOException => None }

  /** Age of the lock in millis, or None if it vanished. */
  private def ageMs(fs: FileSystem, lock: Path): Option[Long] =
    try Some(System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime)
    catch { case _: java.io.IOException => None }

  /** Break a stale main lock and acquire it with `token`. Single-winner:
    * breakers serialize on a `.breaker` lock, and the delete is
    * conditional on the lock still holding the token observed as stale.
    */
  private def breakStaleAndAcquire(fs: FileSystem, lock: Path,
      token: String): Boolean = {
    val observedAge = ageMs(fs, lock)
    if (observedAge.isEmpty)
      // holder released between our failed tryLock and now — re-race once
      return tryLock(fs, lock, token)
    if (observedAge.get <= ttlMs) return false // fresh lock: honor it
    val observedTokenOpt = readToken(fs, lock)
    if (observedTokenOpt.isEmpty) return tryLock(fs, lock, token)
    val observedToken = observedTokenOpt.get

    val breaker = new Path(lock.getParent, s"${lock.getName}.breaker")
    if (!tryLock(fs, breaker, token)) {
      // another breaker is acting; if ITS holder crashed too (age > ttl),
      // clear it so the system self-heals, but still lose this commit —
      // the caller's retry loop comes back around
      if (ageMs(fs, breaker).exists(_ > ttlMs)) fs.delete(breaker, false)
      return false
    }
    try {
      // under the breaker mutex: delete ONLY the lock instance we observed
      // as stale. If a faster breaker already replaced it with a fresh
      // lock, tokens differ and we leave it untouched.
      if (readToken(fs, lock).contains(observedToken)) {
        fs.delete(lock, false)
        // the BREAK is the delete — audit it even if this breaker then
        // loses the re-acquire race to a fresh committer
        logBreakEvent(fs, lock, observedToken, observedAge.get, token)
        tryLock(fs, lock, token)
      } else false
    } finally fs.delete(breaker, false)
  }

  /** Telemetry: record who broke which stale lock, when, and how old it
    * was — read back by the `$locks` system table. Best-effort (an IO
    * failure here must not fail the commit).
    */
  private def logBreakEvent(fs: FileSystem, lock: Path, brokenToken: String,
      ageMillis: Long, breakerToken: String): Unit =
    try {
      val dir = new Path(lock.getParent, ".lock-events")
      fs.mkdirs(dir)
      val evt = new Path(dir, s"break-${UUID.randomUUID()}.json")
      val json = s"""{"lock":"${lock.getName}","brokenToken":"$brokenToken",""" +
        s""""ageMs":$ageMillis,"breakerToken":"$breakerToken",""" +
        s""""atMillis":${System.currentTimeMillis()}}"""
      val out = fs.create(evt, true)
      try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    } catch { case _: java.io.IOException => () }

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val fs = fsOf()
    if (fs.exists(target)) return false
    fs.mkdirs(target.getParent)
    val lock = new Path(target.getParent, s".${target.getName}.lock")
    val token = UUID.randomUUID().toString
    val locked = tryLock(fs, lock, token) || breakStaleAndAcquire(fs, lock, token)
    if (!locked) return false
    try {
      // under the mutex: nobody else writes `target`, so check + publish
      // is race-free; write-then-rename keeps readers from seeing a
      // partial object
      if (fs.exists(target)) return false
      val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // verify-before-publish: if a breaker yanked our lock (it believed us
      // crashed), we no longer hold the mutex — abort rather than risk
      // overwriting the new holder's publish
      val stillOwn = readToken(fs, lock).contains(token)
      val ok = stillOwn &&
        (try fs.rename(tmp, target) catch { case _: java.io.IOException => false })
      if (!ok) fs.delete(tmp, false)
      ok
    } finally {
      // release only OUR lock — never a successor's
      if (readToken(fs, lock).contains(token)) fs.delete(lock, false)
    }
  }
}
