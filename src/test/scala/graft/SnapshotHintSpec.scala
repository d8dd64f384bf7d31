package graft

import graft.core.{ColStats, DataFileMeta, FileStore, ManifestEntry}
import graft.table.GraftTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** The snapshot LATEST hint (reference: SnapshotManager readHint /
  * commitLatestHint): latestSnapshotId must resolve through one GET + a
  * forward probe instead of listing the snapshot dir, and every way the
  * hint can be wrong — stale, pointing past the chain, corrupt, torn,
  * missing — must self-heal to the listing's answer. A hint that does
  * NOT self-heal silently serves time-travel reads and commit CAS loops
  * a wrong "latest", the second-worst failure mode after a wrong fold.
  */
class SnapshotHintSpec extends SparkSpec {

  private def newStore(dir: String): FileStore =
    new FileStore(dir, spark.sessionState.newHadoopConf())

  private def fileOf(id: Int): DataFileMeta =
    DataFileMeta(
      path = f"data/f-$id%06d.parquet", size = 1L << 20, rowCount = 10L,
      partition = Nil, bucket = 0, level = 0,
      minSeq = 0L, maxSeq = 0L, schemaId = 0L,
      stats = Map("k" -> ColStats(Some(id.toString), Some(id.toString), 0L)))

  private def setup(): (FileStore, Path) = {
    val dir = tmpTable()
    GraftTable.create(spark, dir, StructType(Seq(StructField("k", LongType))))
    val store = newStore(dir)
    (1 to 5).foreach(i =>
      store.commit(Seq(ManifestEntry(ManifestEntry.ADD, fileOf(i))), "APPEND"))
    (store, new Path(store.snapshotDir, "LATEST"))
  }

  test("commit writes the hint; latestSnapshotId resolves through it") {
    val (store, hint) = setup()
    assert(store.fs.exists(hint), "commit did not write snapshot/LATEST")
    assert(store.readString(hint).trim == "5")
    assert(store.latestSnapshotId.contains(5L))
  }

  test("stale hint self-heals by probing forward past racing commits") {
    val (store, hint) = setup()
    store.writeString(hint, "2") // a slow writer's hint landed late
    assert(store.latestSnapshotId.contains(5L))
  }

  test("corrupt, torn, and forward-dangling hints fall back to the listing") {
    val (store, hint) = setup()
    store.writeString(hint, "not-a-number")
    assert(store.latestSnapshotId.contains(5L))
    store.writeString(hint, "") // torn write: empty file visible
    assert(store.latestSnapshotId.contains(5L))
    store.writeString(hint, "11") // points past the chain (no snapshot-11)
    assert(store.latestSnapshotId.contains(5L))
    store.fs.delete(hint, false) // missing entirely
    assert(store.latestSnapshotId.contains(5L))
    // the next commit restores the fast path
    store.commit(Seq(ManifestEntry(ManifestEntry.ADD, fileOf(6))), "APPEND")
    assert(store.readString(hint).trim == "6")
    assert(store.latestSnapshotId.contains(6L))
  }

  test("hint file is ignored by the snapshot listing and survives expiry") {
    val (store, _) = setup()
    assert(store.snapshotIds == (1L to 5L))
    // expiry trims the OLD end only — the hint keeps pointing at latest
    val t = GraftTable.load(spark, store.root)
    t.expireSnapshots(retainLast = 2)
    assert(store.latestSnapshotId.contains(5L))
    assert(store.snapshotIds.min > 1L)
  }

  test("a 1000-commit-stale hint resolves in O(log k) probes (gallop)") {
    val (store, _) = setup()
    var probes = 0
    val latest = 1000L
    val got = store.gallopLast(1L, id => { probes += 1; id <= latest })
    assert(got == latest)
    // gallop ≈ log₂k doubling steps + log₂k bisection steps (+1 overshoot)
    assert(probes <= 25, s"gallop used $probes probes for a 999-stale hint")
    // degenerate cases stay cheap and exact
    probes = 0
    assert(store.gallopLast(1000L, id => { probes += 1; id <= latest }) == latest)
    assert(probes == 1, "fresh hint must cost exactly one probe")
  }

  test("expiry writes EARLIEST; earliestSnapshotId resolves through it") {
    val (store, _) = setup()
    // first commit seeded the floor pointer
    val hint = new Path(store.snapshotDir, "EARLIEST")
    assert(store.fs.exists(hint), "first commit did not seed snapshot/EARLIEST")
    assert(store.readString(hint).trim == "1")
    assert(store.earliestSnapshotId.contains(1L))
    val t = GraftTable.load(spark, store.root)
    t.expireSnapshots(retainLast = 2)
    val floor = store.snapshotIds.min
    assert(floor > 1L)
    assert(store.readString(hint).trim == floor.toString,
      "expiry must rewrite the EARLIEST hint past the trimmed ids")
    assert(store.earliestSnapshotId.contains(floor))
  }

  test("EARLIEST self-heals: stale-high probes backward, dangling LISTs") {
    val (store, _) = setup()
    val hint = new Path(store.snapshotDir, "EARLIEST")
    store.writeString(hint, "4") // stale-high (e.g. copied pointer)
    assert(store.earliestSnapshotId.contains(1L),
      "a validating-but-high hint must probe backward to the run start")
    store.writeString(hint, "99") // dangling → exists check fails → LIST
    assert(store.earliestSnapshotId.contains(1L))
    store.writeString(hint, "garbage")
    assert(store.earliestSnapshotId.contains(1L))
    store.fs.delete(hint, false)
    assert(store.earliestSnapshotId.contains(1L))
  }

  test("snapshotIdsHinted equals the listing, hinted or not") {
    val (store, _) = setup()
    assert(store.snapshotIdsHinted == store.snapshotIds)
    val t = GraftTable.load(spark, store.root)
    t.expireSnapshots(retainLast = 3)
    assert(store.snapshotIdsHinted == store.snapshotIds)
    // break one hint → still equal via the LIST fallback
    store.fs.delete(new Path(store.snapshotDir, "EARLIEST"), false)
    assert(store.snapshotIdsHinted == store.snapshotIds)
  }

  test("branch fork seeds the branch's own hint") {
    val (store, _) = setup()
    store.createBranch("b1", 3L)
    val b = store.ofBranch("b1")
    assert(store.readString(new Path(b.snapshotDir, "LATEST")).trim == "3")
    assert(b.latestSnapshotId.contains(3L))
    // branch commits advance the branch hint, not main's
    b.commit(Seq(ManifestEntry(ManifestEntry.ADD, fileOf(99))), "APPEND")
    assert(b.latestSnapshotId.contains(4L))
    assert(store.latestSnapshotId.contains(5L))
  }
}
