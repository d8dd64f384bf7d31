package graft

import graft.table.GraftTable
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try

/** Optimistic-concurrency commit under real racing writers: the snapshot
  * chain is advanced by atomic rename, losers re-read the latest snapshot
  * and retry (reference: FileStoreCommitImpl's retry loop). No commit may
  * be lost, and the final state must be the union of all batches.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the commit-atomicity impl pinned (both impls must
    * satisfy the same CommitStore contract under contention).
    */
  private def withCommitStore[A](impl: String)(body: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("graft.commit-store")
    hc.set("graft.commit-store", impl)
    try body
    finally if (prev == null) hc.unset("graft.commit-store") else hc.set("graft.commit-store", prev)
  }

  for (impl <- Seq("rename", "lock", "conditional-put"))
  test(s"8 racing appenders [$impl]: every commit lands, no rows lost")(withCommitStore(impl) {
    val df0 = Seq((0L, "seed")).toDF("k", "v")
    // write-only: this test asserts the exact snapshot-id sequence, which
    // writer-side auto-compaction would interleave with COMPACT commits
    val t = GraftTable.create(spark, tmpTable(), df0.schema,
      options = Map("write-only" -> "true"))
    val writers = 8
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val results = (0 until writers).map { w =>
      pool.submit(new java.util.concurrent.Callable[Try[Long]] {
        override def call(): Try[Long] = {
          start.await()
          Try {
            // each writer its own table handle (separate driver-side state)
            val mine = GraftTable.load(spark, t.location)
            mine.append(Seq((w.toLong + 1, s"writer$w")).toDF("k", "v")).id
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val ids = results.map(_.get(10, TimeUnit.SECONDS))
    assert(ids.forall(_.isSuccess), ids.filter(_.isFailure).mkString("; "))
    // every writer got a DISTINCT snapshot id — nobody overwrote anybody
    assert(ids.map(_.get).distinct.size == writers, ids.map(_.get).toString)
    assert(t.store.snapshotIds == (1L to writers.toLong),
      t.store.snapshotIds.toString)
    val rows = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == (0 until writers).map(w => (w.toLong + 1, s"writer$w")).toSet,
      s"lost or duplicated rows: $rows")
  })

  test("lock store: breaking a crashed committer's stale lock is audited in $locks")(
    withCommitStore("lock") {
      val df0 = Seq((1L, "a")).toDF("k", "v")
      val t = GraftTable.create(spark, tmpTable(), df0.schema,
        options = Map("write-only" -> "true"))
      t.append(df0) // snapshot-1
      // simulate a crashed committer holding the NEXT snapshot's lock,
      // long past the 10-minute TTL
      val lockPath = java.nio.file.Paths.get(
        t.store.snapshotDir.toUri.getPath, ".snapshot-2.json.lock")
      java.nio.file.Files.createDirectories(lockPath.getParent)
      java.nio.file.Files.write(lockPath, "crashed-holder".getBytes)
      java.nio.file.Files.setLastModifiedTime(lockPath,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 11 * 60 * 1000L))
      t.append(df0) // must break the stale lock and commit snapshot-2
      assert(t.store.latestSnapshotId.contains(2L))
      val events = t.system("locks").collect()
      val broken = events.filter(_.getString(0) == "broken")
      assert(broken.length == 1, events.mkString("; "))
      assert(broken(0).getString(1) == ".snapshot-2.json.lock")
      assert(broken(0).getString(2) == "crashed-holder")
      assert(broken(0).getLong(3) >= 10 * 60 * 1000L, "recorded age past TTL")
    })

  test("stale rewrite is rejected: deleting an already-deleted file conflicts") {
    import graft.core.ManifestEntry
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = GraftTable.create(spark, tmpTable(), df0.schema, primaryKeys = Seq("k"))
    t.upsert(df0)
    val victim = t.store.liveFiles(t.store.latestSnapshot.get).head
    // writer A compacts (rewrites victim away)
    t.compact()
    // writer B, planned against the OLD snapshot, tries to delete the same
    // file — the optimistic conflict check must refuse, not corrupt
    val ex = intercept[IllegalArgumentException] {
      t.store.commit(Seq(ManifestEntry(ManifestEntry.DELETE, victim)), "COMPACT")
    }
    assert(ex.getMessage.contains("conflict"), ex.getMessage)
    assert(t.toDF.count() == 2)
  }

  for (impl <- Seq("rename", "lock", "conditional-put"))
  test(s"racing upserts to the same key [$impl]: chain stays linear, one winner per seq")(withCommitStore(impl) {
    val df0 = Seq((1L, 0L)).toDF("k", "n")
    val t = GraftTable.create(spark, tmpTable(), df0.schema, primaryKeys = Seq("k"),
      options = Map("write-only" -> "true"))
    val writers = 6
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          val mine = GraftTable.load(spark, t.location)
          mine.upsert(Seq((1L, w.toLong + 100)).toDF("k", "n"))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    futures.foreach(_.get())
    assert(t.store.snapshotIds.size == writers)
    // merged read resolves to exactly one row for the contended key, and its
    // value is the one written by the LAST snapshot in the chain
    val merged = t.toDF.collect()
    assert(merged.length == 1)
    val lastWriterVal = t.toDF(t.store.latestSnapshotId.get).collect()(0).getLong(1)
    assert(merged(0).getLong(1) == lastWriterVal)
  })
}
