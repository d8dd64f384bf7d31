package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Deletion-vector mode for primary-key tables (reference: CoreOptions
  * "deletion-vectors.enabled"): upserts mask superseded rows in existing
  * files via per-file bitmaps, reads are raw + DV (no merge-on-read).
  * Results must be indistinguishable from a plain merge-on-read table.
  */
class DvTableSpec extends SparkSpec {

  private def dvTable(extra: Map[String, String] = Map.empty): GraftTable =
    GraftTable.create(spark, tmpTable(), sf("orders").schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "4", "deletion-vectors.enabled" -> "true",
        "write-only" -> "true") ++ extra)

  test("dv upsert chain matches a merge-on-read table bit for bit") {
    val orders = sf("orders").cache()
    val dv = dvTable()
    val mor = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "4", "write-only" -> "true"))
    def drive(t: GraftTable): Unit = {
      t.upsert(orders)
      t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 13 === 0)
    }
    drive(dv); drive(mor)
    assert(dv.toDF.count() == mor.toDF.count())
    assert(dv.toDF.except(mor.toDF).isEmpty && mor.toDF.except(dv.toDF).isEmpty)
    // the second upsert actually produced masks
    val live = dv.store.liveFiles(dv.store.latestSnapshot.get)
    assert(live.exists(_.dvPath.isDefined), "expected dv sidecars on masked files")
    // DSv2 read agrees (raw + dv scan path)
    val ident = s"graft_dv_t"
    dv.toDF.createOrReplaceTempView(ident)
    assert(spark.table(ident).count() == mor.toDF.count())
  }

  test("dv table: VALUE predicates push to dv-free files without losing versions") {
    val orders = sf("orders").cache()
    val dv = dvTable()
    dv.upsert(orders)
    // rewrite a slice so old versions exist (masked in THEIR files) and
    // the new rows live in a dv-free L0 file
    dv.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(-1.0)))
    dv.delete(col("o_orderkey") % 13 === 0)
    // value filter straddles old and new versions: only the REWRITTEN
    // rows match, and none of the superseded ones resurrect
    val neg = dv.toDF.filter(col("o_totalprice") < 0)
    val want = orders.filter(col("o_orderkey") % 7 === 0 &&
      col("o_orderkey") % 13 =!= 0).count()
    assert(neg.count() == want, s"got ${neg.count()} want $want")
    // and the complement: no rewritten key's OLD price may survive
    val oldPrices = dv.toDF.filter(col("o_orderkey") % 7 === 0 &&
      col("o_totalprice") > 0).count()
    assert(oldPrices == 0, s"superseded versions resurrected: $oldPrices")
  }

  test("dv sidecars are produced by executor tasks, driver sees only metadata") {
    // dvSidecarEntries guards with require(TaskContext.get != null), so a
    // refactor back to a driver-side write loop fails EVERY dv test. This
    // test pins the observable contract: sidecar files land under dv/ with
    // one file per masked data file, and the manifest delta references them.
    val orders = sf("orders")
    val t = dvTable()
    t.upsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 5 === 0)) // masks prior files
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    val masked = live.filter(_.dvPath.isDefined)
    assert(masked.nonEmpty, "expected masked files")
    val dvDirFiles = t.store.fs.listStatus(
      new org.apache.hadoop.fs.Path(t.store.rootPath, "dv"))
      .map(_.getPath.getName).toSet
    masked.foreach { f =>
      assert(dvDirFiles.contains(f.dvPath.get.stripPrefix("dv/")),
        s"sidecar ${f.dvPath.get} missing on disk")
      assert(f.dvCount > 0 && f.dvCount < f.rowCount)
    }
    // masks are correct: merged count unaffected by double-application
    assert(t.toDF.count() == orders.count())
  }

  test("intra-batch duplicates collapse to the last version before staging") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "2", "deletion-vectors.enabled" -> "true"))
    t.upsert(Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("k", "v"))
    val rows = t.toDF.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "c"), (2L, "b")))
    // raw file rows: exactly one per key (no merge available to hide dups)
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.map(_.rowCount).sum == 2)
  }

  test("compaction clears masks and tombstones, content invariant") {
    val orders = sf("orders").limit(300).cache()
    val t = dvTable()
    t.upsert(orders)
    t.upsert(orders.withColumn("o_comment", lit("v2")))
    t.delete(col("o_orderkey") % 5 === 0)
    val before = t.toDF.orderBy("o_orderkey").collect()
    t.compact()
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.forall(_.dvPath.isEmpty), "compaction must clear dv sidecars")
    assert(live.forall(_.level == GraftTable.MaxLevel))
    assert(t.toDF.orderBy("o_orderkey").collect().sameElements(before))
  }

  test("fully superseded files drop instead of carrying full masks") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "deletion-vectors.enabled" -> "true",
        "write-only" -> "true"))
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.upsert(Seq((1L, "a2"), (2L, "b2")).toDF("k", "v")) // supersedes everything
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.size == 1, s"old file should be dropped, got ${live.map(_.path)}")
    assert(t.toDF.count() == 2)
  }

  test("partitioned dv table: masks stay partition-local, pruning works") {
    import spark.implicits._
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "B", 40.0))
      .toDF("k", "pt", "v")
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      partitionKeys = Seq("pt"), primaryKeys = Seq("k", "pt"),
      options = Map("bucket" -> "2", "deletion-vectors.enabled" -> "true"))
    t.upsert(df)
    t.upsert(Seq((1L, "A", 11.0), (3L, "B", 31.0)).toDF("k", "pt", "v"))
    val rows = t.toDF.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 11.0), (2L, 20.0), (3L, 31.0), (4L, 40.0)))
    assert(t.toDF.filter(col("pt") === "A").count() == 2)
  }

  test("SQL UPDATE and MERGE INTO work on a dv table through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dv-wh").toString
    spark.conf.set("spark.sql.catalog.gdv", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.db")
    spark.sql(
      """CREATE TABLE gdv.db.t (k BIGINT, v DOUBLE) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2',
        |  'deletion-vectors.enabled' = 'true')""".stripMargin)
    spark.sql("INSERT INTO gdv.db.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("UPDATE gdv.db.t SET v = v * 10 WHERE k <= 2")
    spark.sql("""MERGE INTO gdv.db.t t USING (SELECT 3L AS k, 99.0 AS v) s
      |ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("DELETE FROM gdv.db.t WHERE k = 1")
    val rows = spark.sql("SELECT k, v FROM gdv.db.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((2L, 20.0), (3L, 99.0)))
  }

  test("dv + changelog-producer=lookup: exact -U/+U stream without merge reads") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "2", "deletion-vectors.enabled" -> "true",
        "changelog-producer" -> "lookup", "write-only" -> "true"))
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val s1 = t.store.latestSnapshotId.get
    t.upsert(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"))
    val ch = t.incremental(s1, s1 + 1)
      .select(col("k"), col("v"), col("_row_kind"))
      .orderBy("k", "_row_kind")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ch.toSeq == Seq((1L, "a2", "+U"), (1L, "a", "-U"), (3L, "c", "+I")),
      ch.mkString(";"))
    assert(t.toDF.count() == 3)
  }

  test("fuzz: dv table and mor table agree under random upsert/delete chains") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val st = Seq((1L, 0L, "x")).toDF("k", "n", "v").schema
    for (trial <- 1 to 3) {
      val dv = GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
        options = Map("bucket" -> "2", "deletion-vectors.enabled" -> "true"))
      val mor = GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
        options = Map("bucket" -> "2"))
      for (step <- 1 to 6) {
        val op = rnd.nextInt(3)
        if (op < 2) {
          // upsert a random batch, possibly with intra-batch duplicate keys
          val rows = (1 to (5 + rnd.nextInt(20))).map { _ =>
            val k = rnd.nextInt(30).toLong
            (k, rnd.nextLong(1000), s"t$trial-s$step-${rnd.nextInt(100)}")
          }
          val df = rows.toDF("k", "n", "v")
          dv.upsert(df); mor.upsert(df)
        } else {
          val m = 2 + rnd.nextInt(5)
          dv.delete(col("k") % m === 0); mor.delete(col("k") % m === 0)
        }
        val a = dv.toDF.orderBy("k").collect().toSeq
        val b = mor.toDF.orderBy("k").collect().toSeq
        assert(a == b, s"trial $trial step $step: dv=$a mor=$b")
      }
      dv.compact()
      assert(dv.toDF.orderBy("k").collect().toSeq ==
        mor.toDF.orderBy("k").collect().toSeq)
    }
  }

  test("readStream serves a dv + lookup-producer table") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "deletion-vectors.enabled" -> "true",
        "changelog-producer" -> "lookup", "write-only" -> "true"))
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.upsert(Seq((1L, "a2")).toDF("k", "v"))
    // from-snapshot 1: replay from the beginning via the lookup changelog —
    // +I a, +I b, then the -U/+U pair for the dv-masked update
    val q = spark.readStream.format("graft")
      .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
      .load(t.location)
      .writeStream.format("memory").queryName("dv_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("dv_stream")
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains((1L, "a2", "+U")) && rows.contains((1L, "a", "-U")),
      rows.toString)
    assert(rows.contains((2L, "b", "+I")))
    // latest-full (the default): first batch is the full MERGED state as
    // +I rows — no historical churn (reference: FullStartingScanner)
    val q2 = spark.readStream.format("graft")
      .option("scan.mode", "latest-full").load(t.location)
      .writeStream.format("memory").queryName("dv_stream_full")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val full = spark.table("dv_stream_full")
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(full == Set((1L, "a2", "+I"), (2L, "b", "+I")), full.toString)
  }

  test("dv delete is metadata-only: no new data files, just masks") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "deletion-vectors.enabled" -> "true",
        "write-only" -> "true"))
    t.upsert((1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"))
    val filesBefore = t.store.liveFiles(t.store.latestSnapshot.get).map(_.path).toSet
    t.delete(col("k") % 4 === 0)
    val after = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(after.map(_.path).toSet == filesBefore, "delete must not write data files")
    assert(after.exists(_.dvCount > 0))
    assert(t.toDF.count() == 75)
    assert(t.toDF.filter(col("k") % 4 === 0).count() == 0)
    // deleting everything drops the files outright
    t.delete(lit(true))
    assert(t.store.liveFiles(t.store.latestSnapshot.get).isEmpty)
    assert(t.toDF.count() == 0)
  }

  test("dv mode composes with dynamic buckets") {
    import spark.implicits._
    val st = Seq((1L, "x")).toDF("k", "v").schema
    val t = GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1", "deletion-vectors.enabled" -> "true",
        "dynamic-bucket.target-row-num" -> "50", "write-only" -> "true"))
    val big = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    t.upsert(big)
    t.upsert((1L to 200L by 5).map(k => (k, s"u$k")).toDF("k", "v"))
    val rows = t.toDF.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 200)
    assert(rows.forall { case (k, v) => v == (if (k % 5 == 1) s"u$k" else s"v$k") })
    // the update produced masks, and dynamic assignment opened several buckets
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.exists(_.dvPath.isDefined))
    assert(live.map(_.bucket).distinct.size >= 3)
  }

  test("dv masks stay correct across schema evolution") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "2", "deletion-vectors.enabled" -> "true",
        "write-only" -> "true"))
    t.upsert((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"))
    // evolve: add a column, rename the value column
    t.addColumn("extra", org.apache.spark.sql.types.IntegerType)
    t.renameColumn("v", "val")
    // upsert under the NEW schema supersedes rows written under the OLD one
    // (the mask join resolves key columns by field id across schema versions)
    t.upsert((1L to 20L by 2).map(k => (k, s"u$k", k.toInt))
      .toDF("k", "val", "extra"))
    val rows = t.toDF.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(rows.length == 20)
    rows.foreach { case (k, v, e) =>
      if (k % 2 == 1) assert(v == s"u$k" && e == k.toInt, s"$k: $v/$e")
      else assert(v == s"v$k" && e == -1, s"$k: $v/$e")
    }
    // old-schema files got masked
    assert(t.store.liveFiles(t.store.latestSnapshot.get).exists(_.dvCount > 0))
  }

  test("audit_log and read_optimized system tables on a dv table") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpTable(),
      Seq((1L, "x")).toDF("k", "v").schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "deletion-vectors.enabled" -> "true",
        "write-only" -> "true"))
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.upsert(Seq((1L, "a2")).toDF("k", "v"))
    // audit_log: surviving raw rows with kinds; the masked old version of
    // key 1 is gone, the new one is +I
    val audit = t.system("audit_log")
      .select("_row_kind", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(audit == Set(("+I", 1L, "a2"), ("+I", 2L, "b")), audit.toString)
    // read_optimized: empty until a compaction produces max-level files
    assert(t.readOptimized.count() == 0)
    t.compact()
    assert(t.readOptimized.count() == 2)
  }

  test("mode restrictions are enforced at create time") {
    import spark.implicits._
    val st = Seq((1L, "x")).toDF("k", "v").schema
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
        options = Map("deletion-vectors.enabled" -> "true",
          "merge-engine" -> "partial-update"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
        options = Map("deletion-vectors.enabled" -> "true",
          "sequence.field" -> "v"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
        options = Map("deletion-vectors.enabled" -> "true",
          "changelog-producer" -> "input"))
    }
    val t = GraftTable.create(spark, tmpTable(), st, primaryKeys = Seq("k"),
      options = Map("deletion-vectors.enabled" -> "true"))
    t.upsert(Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] { t.incremental(0, 1) }
  }
}
