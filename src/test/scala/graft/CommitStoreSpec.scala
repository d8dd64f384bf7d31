package graft

import graft.core.{CommitStore, ConditionalPutCommitStore, LocalConditionalPutClient, LockFileCommitStore, RenameCommitStore}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The CommitStore contract (exclusive, atomic, durable) exercised
  * directly under thread contention for BOTH shipped impls — the
  * filesystem rename/hard-link store and the lock-file mutex emulation of
  * an object-store conditional PUT.
  */
class CommitStoreSpec extends AnyFunSuite {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-commitstore").toString

  private def fsOf(root: String) = {
    val conf = new Configuration()
    () => new Path(root).getFileSystem(conf)
  }

  for ((name, mk) <- Seq(
    "rename" -> ((r: String) => new RenameCommitStore(fsOf(r)): CommitStore),
    "lock" -> ((r: String) => new LockFileCommitStore(fsOf(r)): CommitStore),
    "conditional-put" -> ((_: String) =>
      new ConditionalPutCommitStore(new LocalConditionalPutClient): CommitStore))) {

    test(s"$name: 16 racers for one target -> exactly one winner, content intact") {
      val root = tmpDir()
      val store = mk(root)
      val target = new Path(root, "snapshot-1")
      val racers = 16
      val pool = Executors.newFixedThreadPool(racers)
      val start = new CountDownLatch(1)
      val results = (0 until racers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = { start.await(); store.putIfAbsent(target, s"writer-$i") }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      val wins = results.map(_.get())
      assert(wins.count(identity) == 1, s"exactly one winner: $wins")
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "snapshot-1")))
      val winner = wins.indexOf(true)
      assert(content == s"writer-$winner", "winner's content, complete")
      // a later put against the existing target loses immediately
      assert(!store.putIfAbsent(target, "latecomer"))
    }

    test(s"$name: sequential chain — every id lands exactly once") {
      val root = tmpDir()
      val store = mk(root)
      (1 to 20).foreach { i =>
        assert(store.putIfAbsent(new Path(root, s"snapshot-$i"), s"s$i"))
      }
      (1 to 20).foreach { i =>
        assert(!store.putIfAbsent(new Path(root, s"snapshot-$i"), "dupe"))
      }
    }
  }

  test("lock: a stale lock from a crashed committer is broken, commit proceeds") {
    val root = tmpDir()
    val store = new LockFileCommitStore(fsOf(root), ttlMs = 50)
    val target = new Path(root, "snapshot-1")
    // simulate a crashed holder: lock exists, older than the TTL
    val lockPath = java.nio.file.Paths.get(root, ".snapshot-1.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    java.nio.file.Files.write(lockPath, "0".getBytes)
    Thread.sleep(100)
    assert(store.putIfAbsent(target, "recovered"), "stale lock must be broken")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "snapshot-1"))) == "recovered")
    assert(!java.nio.file.Files.exists(lockPath), "lock released after commit")
  }

  test("lock: stale-lock break is single-winner — 16 concurrent breakers, one commit") {
    // Forces the round-10 VERDICT race: a lock from a crashed holder is
    // older than the TTL and MANY committers observe it stale at once.
    // Without breaker serialization + token-conditional delete, two
    // breakers could both acquire (B's delayed delete removes A's fresh
    // lock) and both publish. Asserts at most one winner, winner's
    // content intact, and a telemetry event recorded for the break.
    for (round <- 1 to 5) {
      val root = tmpDir()
      val store = new LockFileCommitStore(fsOf(root), ttlMs = 50)
      val target = new Path(root, s"snapshot-$round")
      val lockPath = java.nio.file.Paths.get(root, s".snapshot-$round.lock")
      java.nio.file.Files.createDirectories(lockPath.getParent)
      java.nio.file.Files.write(lockPath, "dead-holder-token".getBytes)
      Thread.sleep(120) // age the lock past the TTL
      val racers = 16
      val pool = Executors.newFixedThreadPool(racers)
      val start = new CountDownLatch(1)
      val results = (0 until racers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = { start.await(); store.putIfAbsent(target, s"breaker-$i") }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      val wins = results.map(_.get())
      assert(wins.count(identity) <= 1, s"round $round: at most one winner: $wins")
      if (wins.contains(true)) {
        val winner = wins.indexOf(true)
        val content = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(root, s"snapshot-$round")))
        assert(content == s"breaker-$winner",
          s"round $round: winner's content intact, not interleaved/overwritten")
        // the break is visible to operators: a .lock-events record names
        // the dead holder's token (read back by the $locks system table)
        val evDir = java.nio.file.Paths.get(root, ".lock-events")
        assert(java.nio.file.Files.exists(evDir), "break telemetry dir written")
        val events = java.nio.file.Files.list(evDir).toArray.map(p =>
          new String(java.nio.file.Files.readAllBytes(
            p.asInstanceOf[java.nio.file.Path])))
        assert(events.exists(_.contains("dead-holder-token")),
          s"break event names the broken holder: ${events.mkString("; ")}")
      }
      assert(!java.nio.file.Files.exists(lockPath), s"round $round: lock released")
    }
  }

  test("lock: a FRESH lock is honored — racer loses instead of breaking it") {
    val root = tmpDir()
    val store = new LockFileCommitStore(fsOf(root)) // default 10 min TTL
    val lockPath = java.nio.file.Paths.get(root, ".snapshot-1.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    java.nio.file.Files.write(lockPath,
      String.valueOf(System.currentTimeMillis()).getBytes)
    assert(!store.putIfAbsent(new Path(root, "snapshot-1"), "intruder"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "snapshot-1")))
  }
}
