package graft

import graft.core.{ColStats, DataFileMeta, FileStore, ManifestEntry, Pruning}
import graft.table.GraftTable
import org.apache.spark.sql.types._

/** Property test for the INCREMENTAL manifest fold (FileStore.commit):
  * random interleaved ADD/DELETE commit sequences, driven with tiny
  * thresholds so incremental folds, residual-DELETE manifests, and the
  * residual-clearing FULL fold all trigger many times. The oracle is a
  * live-set map maintained by the test — after every commit,
  * `liveFiles` must equal it exactly (path AND metadata), and a
  * shard-filtered fold must equal the oracle restricted to matching
  * partitions. A wrong fold here silently loses or resurrects data
  * files — the worst failure mode a table format can have.
  */
class ManifestFoldPropertySpec extends SparkSpec {

  private def newStore(dir: String): FileStore =
    new FileStore(dir, spark.sessionState.newHadoopConf()) {
      override val manifestMergeThreshold = 3
      override val maxManifestEntries = 8
      // thrash the bounded manifest LRU (each shard has up to 8 entries)
      // so every fold and liveFiles call exercises read-after-evict
      override val manifestCacheMaxEntries = 10L
    }

  private def fileOf(id: Int, part: String, schemaId: Long): DataFileMeta =
    DataFileMeta(
      path = f"data/p=$part/f-$id%06d.parquet",
      size = 1L << 20, rowCount = 100L,
      partition = Seq(part), bucket = 0, level = 0,
      minSeq = 0L, maxSeq = 0L, schemaId = schemaId,
      stats = Map("k" -> ColStats(Some(id.toString), Some(id.toString), 0L)))

  test("random ADD/DELETE commit sequences: fold preserves the exact live set") {
    val dir = tmpTable()
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("p", StringType), StructField("k", LongType))),
      partitionKeys = Seq("p"))
    val store = newStore(dir)
    val rnd = new scala.util.Random(42)
    val expected = scala.collection.mutable.LinkedHashMap.empty[String, DataFileMeta]
    var nextId = 0
    var sawResidual = false
    var sawPrefixReuse = false
    var prevFullShards = Set.empty[String]

    (0 until 120).foreach { round =>
      val adds = (0 until (1 + rnd.nextInt(5))).map { _ =>
        val f = fileOf(nextId, s"p${rnd.nextInt(4)}", t.schema.id)
        nextId += 1
        f
      }
      // delete-heavy bursts push residuals past maxManifestEntries (8)
      // so the full-fold clearing branch runs too
      val delCount =
        if (round % 17 == 16) math.min(12, expected.size)
        else rnd.nextInt(math.min(4, expected.size + 1))
      val dels = rnd.shuffle(expected.keys.toVector).take(delCount)
        .map(expected(_))
      // DV-mask-style churn: DELETE + re-ADD of the SAME live path with
      // updated metadata — the stale copy stays in the kept prefix until
      // the proportional full fold reclaims it (the r17 review's blind
      // spot: pure re-add churn must not grow chain metadata unboundedly)
      // dvPath + dvCount move together (the codec serializes them as a
      // pair, like the real DV write path produces them)
      val readds = rnd.shuffle((expected.keys.toSet -- dels.map(_.path)).toVector)
        .take(rnd.nextInt(3)).map(p => expected(p).copy(
          dvPath = Some(s"dv/r$round-${expected(p).dvCount + 1}.bin"),
          dvCount = expected(p).dvCount + 1))
      val delta = adds.map(f => ManifestEntry(ManifestEntry.ADD, f)) ++
        dels.map(f => ManifestEntry(ManifestEntry.DELETE, f)) ++
        readds.flatMap(f => Seq(ManifestEntry(ManifestEntry.DELETE, f),
          ManifestEntry(ManifestEntry.ADD, f)))
      store.commit(delta, "APPEND")
      adds.foreach(f => expected.put(f.path, f))
      dels.foreach(f => expected.remove(f.path))
      readds.foreach(f => expected.put(f.path, f))

      val snap = store.latestSnapshot.get
      val live = store.liveFiles(snap)
      assert(live.size == live.map(_.path).distinct.size,
        s"round $round: duplicate paths in liveFiles")
      assert(live.map(f => f.path -> f).toMap == expected.toMap,
        s"round $round: fold diverged from the oracle " +
          s"(live=${live.size}, expected=${expected.size})")

      // shard-filtered fold == oracle restricted to the partition
      val metaByName = snap.manifestMeta.map(m => m.name -> m).toMap
      val only = store.liveFiles(snap, m => (m.ptMin, m.ptMax) match {
        case (Some(lo), Some(hi)) => Pruning.shardMightMatch(
          org.apache.spark.sql.sources.EqualTo("p", "p1"), Seq("p"), lo, hi)
        case _ => true
      })
      assert(only.filter(_.partition == Seq("p1")).map(_.path).toSet ==
        expected.values.filter(_.partition == Seq("p1")).map(_.path).toSet,
        s"round $round: shard-filtered fold diverged")

      // STATS-restricted fold (shard colStats ranges): never loses a file
      // whose own stats could match, never returns a non-live file
      val thresh = (rnd.nextInt(nextId + 1)).toLong
      val statsKeep = Pruning.compileMight(
        org.apache.spark.sql.sources.GreaterThanOrEqual("k", thresh),
        c => if (c == "k") Some(org.apache.spark.sql.types.LongType) else None)
      val statsOnly = store.liveFiles(snap,
        m => m.colStats.isEmpty || statsKeep(m.colStats, m.rowCount))
      val statsSet = statsOnly.map(_.path).toSet
      val mustHave = expected.values.filter(f =>
        f.stats("k").min.exists(_.toLong >= thresh)).map(_.path).toSet
      assert(mustHave.subsetOf(statsSet),
        s"round $round: stats shard skip LOST matching files " +
          s"(${(mustHave -- statsSet).take(3)})")
      assert(statsSet.subsetOf(expected.keySet),
        s"round $round: stats shard skip resurrected dead files")

      val fullShards = snap.manifests.filter(m => metaByName.get(m).exists(
        mm => mm.addOnly && mm.entries == 8L)).toSet
      if (snap.manifestMeta.exists(m => !m.addOnly &&
          snap.deltaManifests.forall(_ != m.name))) sawResidual = true
      if ((fullShards & prevFullShards).nonEmpty &&
          snap.manifests.size != prevFullShards.size) sawPrefixReuse = true
      prevFullShards = fullShards
    }
    assert(expected.nonEmpty)
    assert(sawResidual,
      "no residual DELETE manifest ever appeared — the delete-preserving " +
        "incremental fold path was never exercised")
    assert(sawPrefixReuse,
      "no kept-prefix shard survived across folds — incrementality broken")
    // chain metadata stays within a constant factor of the live set
    val totalEntries = store.latestSnapshot.get.manifestMeta.map(_.entries).sum
    assert(totalEntries <= 2L * expected.size + 64,
      s"chain entries $totalEntries vs live ${expected.size} — dead " +
        "metadata is not being reclaimed")
    // tiered run merging: adjacent runs differ ≥4× in size, so the run
    // count (= the per-partition shard-overlap factor) stays LOGARITHMIC
    // in the live set instead of one stripe per fold generation
    val endMeta = store.latestSnapshot.get.manifestMeta
    val runCount = endMeta.filter(_.run > 0).map(_.run).distinct.size
    val logBound = 2 + math.ceil(
      math.log(math.max(totalEntries, 2).toDouble) / math.log(4)).toInt
    assert(runCount <= logBound,
      s"$runCount runs over $totalEntries entries (bound $logBound) — " +
        "tier merging is not bounding fold-generation striping")
    // and the ≥4× size invariant holds between adjacent runs
    val runSizes = endMeta.filter(_.run > 0).groupBy(_.run).toSeq
      .sortBy(_._1).map(_._2.map(_.entries).sum)
    runSizes.sliding(2).foreach {
      case Seq(a, b) => assert(a >= 4 * b,
        s"adjacent run sizes $a, $b violate the 4x tier invariant " +
          s"(all: $runSizes)")
      case _ =>
    }
  }

  test("pure DV-style re-add churn: stale prefix entries are reclaimed proportionally") {
    // NO foreign deletes at all — every commit DELETE+re-ADDs live paths,
    // so the residual stays empty and only the re-add shadow accounting
    // can ever trigger the clearing full fold. Without it, chain entries
    // grow by ~1 per re-add forever while the live set never changes.
    val dir = tmpTable()
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("p", StringType), StructField("k", LongType))),
      partitionKeys = Seq("p"))
    val store = newStore(dir)
    val rnd = new scala.util.Random(7)
    val expected = scala.collection.mutable.LinkedHashMap.empty[String, DataFileMeta]
    (0 until 24).foreach { i =>
      val f = fileOf(i, s"p${i % 4}", t.schema.id)
      expected.put(f.path, f)
    }
    store.commit(expected.values.toVector
      .map(f => ManifestEntry(ManifestEntry.ADD, f)), "APPEND")
    (0 until 80).foreach { round =>
      val picks = rnd.shuffle(expected.keys.toVector).take(2)
        .map(p => expected(p).copy(
          dvPath = Some(s"dv/r$round-${expected(p).dvCount + 1}.bin"),
          dvCount = expected(p).dvCount + 1))
      store.commit(picks.flatMap(f => Seq(
        ManifestEntry(ManifestEntry.DELETE, f),
        ManifestEntry(ManifestEntry.ADD, f))), "APPEND")
      picks.foreach(f => expected.put(f.path, f))
      val live = store.liveFiles(store.latestSnapshot.get)
      assert(live.map(f => f.path -> f).toMap == expected.toMap,
        s"round $round: fold diverged under re-add churn")
    }
    val totalEntries = store.latestSnapshot.get.manifestMeta.map(_.entries).sum
    assert(totalEntries <= 2L * expected.size + 64,
      s"chain entries $totalEntries vs live ${expected.size} (=24) — " +
        "re-add shadows in kept shards are never reclaimed")
  }

  test("fold output is byte-identical at any manifest decode parallelism") {
    // the decode pool prefetches shards but the fold consumes them
    // strictly in chain order — result (content AND order) must not
    // depend on graft.manifest.parallelism
    val dir = tmpTable()
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("p", StringType), StructField("k", LongType))),
      partitionKeys = Seq("p"))
    val writer = newStore(dir)
    val rnd = new scala.util.Random(23)
    val expected = scala.collection.mutable.LinkedHashMap.empty[String, DataFileMeta]
    var nextId = 0
    (0 until 40).foreach { _ =>
      val adds = (0 until (2 + rnd.nextInt(4))).map { _ =>
        val f = fileOf(nextId, s"p${rnd.nextInt(4)}", t.schema.id)
        nextId += 1; f
      }
      val dels = rnd.shuffle(expected.keys.toVector)
        .take(rnd.nextInt(math.min(3, expected.size + 1))).map(expected(_))
      writer.commit(adds.map(f => ManifestEntry(ManifestEntry.ADD, f)) ++
        dels.map(f => ManifestEntry(ManifestEntry.DELETE, f)), "APPEND")
      adds.foreach(f => expected.put(f.path, f))
      dels.foreach(f => expected.remove(f.path))
    }
    def storeWithPar(par: Int): FileStore = {
      val conf = spark.sessionState.newHadoopConf()
      conf.setInt("graft.manifest.parallelism", par)
      new FileStore(dir, conf) {
        override val manifestMergeThreshold = 3
        override val maxManifestEntries = 8
        override val manifestCacheMaxEntries = 10L
      }
    }
    val snapSeq = storeWithPar(1).latestSnapshot.get
    assert(snapSeq.manifests.size >= 4,
      "fixture too small — the parallel decode path needs ≥4 shards")
    val seq = storeWithPar(1).liveFiles(snapSeq)
    val par8 = storeWithPar(8).liveFiles(snapSeq)
    assert(storeWithPar(8).manifestParallelism == 8)
    assert(seq == par8, "fold order/content diverged under parallel decode")
    assert(seq.map(f => f.path -> f).toMap == expected.toMap)
  }

  test("delete-commit conflict check: partition-scoped fold, exact verdicts") {
    // The conflict check must (a) accept every delete of a live file,
    // (b) reject every delete of a dead/unknown file — while folding only
    // the manifest shards whose partition range overlaps the deleted
    // files' partitions, not the whole live set.
    val dir = tmpTable()
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("p", StringType), StructField("k", LongType))),
      partitionKeys = Seq("p"))
    var manifestReads = 0
    val store = new FileStore(dir, spark.sessionState.newHadoopConf()) {
      override val manifestMergeThreshold = 3
      override val maxManifestEntries = 8
      override def readManifest(name: String, cacheOnMiss: Boolean)
          : Seq[ManifestEntry] = {
        manifestReads += 1
        super.readManifest(name, cacheOnMiss)
      }
    }
    val rnd = new scala.util.Random(11)
    val expected = scala.collection.mutable.LinkedHashMap.empty[String, DataFileMeta]
    val dead = scala.collection.mutable.ArrayBuffer.empty[DataFileMeta]
    var nextId = 0
    (0 until 40).foreach { round =>
      val adds = (0 until (3 + rnd.nextInt(5))).map { _ =>
        val f = fileOf(nextId, s"p${rnd.nextInt(8)}", t.schema.id)
        nextId += 1
        f
      }
      // randomly interleave valid deletes with conflict attempts
      if (round % 5 == 4 && (dead.nonEmpty || true)) {
        val bogus = dead.lastOption.getOrElse(
          fileOf(999000 + round, "p0", t.schema.id)) // never committed
        val ex = intercept[IllegalArgumentException] {
          store.commit(
            Seq(ManifestEntry(ManifestEntry.DELETE, bogus)) ++
              adds.map(f => ManifestEntry(ManifestEntry.ADD, f)), "APPEND")
        }
        assert(ex.getMessage.contains("commit conflict"))
        // the failed commit must not have changed the table
        val after = store.latestSnapshot.map(s =>
          store.liveFiles(s).map(f => f.path -> f).toMap).getOrElse(Map.empty)
        assert(after == expected.toMap, s"round $round: failed commit leaked")
      }
      val dels = rnd.shuffle(expected.keys.toVector)
        .take(rnd.nextInt(math.min(3, expected.size + 1))).map(expected(_))
      store.commit(adds.map(f => ManifestEntry(ManifestEntry.ADD, f)) ++
        dels.map(f => ManifestEntry(ManifestEntry.DELETE, f)), "APPEND")
      adds.foreach(f => expected.put(f.path, f))
      dels.foreach { f => expected.remove(f.path); dead += f }
      val live = store.liveFiles(store.latestSnapshot.get)
      assert(live.map(f => f.path -> f).toMap == expected.toMap,
        s"round $round: fold diverged with conflict checking on")
    }

    // scoping: with the chain folded into partition-sorted full shards, a
    // single-partition delete commit must SKIP shards of other partitions.
    // Settle the chain first: churn until a clearing FULL fold lands
    // (pure ADD-only shards, stale counter 0) so the probe commit itself
    // cannot trigger a fold and the only manifest reads are the conflict
    // check's.
    def settled(): Boolean = store.latestSnapshot.exists(s =>
      s.staleFileEntries == 0 && s.manifestMeta.forall(_.addOnly))
    var churn = 0
    while (!settled() && churn < 200) {
      val p = expected.values.head
      store.commit(Seq(ManifestEntry(ManifestEntry.DELETE, p),
        ManifestEntry(ManifestEntry.ADD, p)), "APPEND")
      churn += 1
    }
    assert(settled(), s"no clearing full fold after $churn churn commits")
    val snap0 = store.latestSnapshot.get
    val totalManifests = snap0.manifests.size
    assert(totalManifests > 6, "fixture too small to demonstrate skipping")
    val victim = expected.values.find(_.partition == Seq("p3")).get
    manifestReads = 0
    store.commit(Seq(ManifestEntry(ManifestEntry.DELETE, victim),
      ManifestEntry(ManifestEntry.ADD, victim)), "APPEND")
    assert(manifestReads < totalManifests / 2,
      s"conflict fold read $manifestReads manifests of a $totalManifests-" +
        "manifest chain for a single-partition delete — shard scoping " +
        "is not happening")
    expected.put(victim.path, victim)
    assert(store.liveFiles(store.latestSnapshot.get)
      .map(f => f.path -> f).toMap == expected.toMap)
  }
}
