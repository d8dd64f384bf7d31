package graft

import graft.table.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  case class Ev(event_id: Long, user_id: Long, version: Long, value: Double)
  case class OpEv(event_id: Long, value: Double, op: String)

  test("stream → graft sink: out-of-order upserts resolve by sequence field, exactly-once") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .format("graft")
      .option("path", path)
      .option("primary-keys", "event_id")
      .option("sequence.field", "version")
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      // batch 1: v2 arrives BEFORE v1 (out of order within the stream)
      input.addData(Ev(1, 10, 2, 20.0), Ev(2, 10, 1, 5.0))
      q.processAllAvailable()
      // batch 2: late v1 for key 1 must NOT override v2; key 2 upgrades to v3
      input.addData(Ev(1, 10, 1, 10.0), Ev(2, 10, 3, 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val t = GraftTable.load(spark, path)
    val rows = t.toDF.orderBy("event_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((1L, 2L, 20.0), (2L, 3L, 7.0)),
      "sequence field must win over arrival order")
    // exactly-once: both batches committed once each (ids 0 and 1),
    // tracked under this writer's commit-user entry
    assert(t.store.latestSnapshot.get.maxCommitIdentifiers.values.max == 1L)
    assert(t.store.snapshotIds.size == 2)
  }

  test("rowkind.field: a string column drives row kinds on streaming writes") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[OpEv]
    val q = input.toDF().writeStream
      .format("graft")
      .option("path", path)
      .option("primary-keys", "event_id")
      .option("rowkind.field", "op")
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData(OpEv(1, 10.0, "+I"), OpEv(2, 20.0, "+I"), OpEv(3, 30.0, "+I"))
      q.processAllAvailable()
      // CDC-shaped batch: update key 2, delete key 3 — kinds from the column
      input.addData(OpEv(2, 25.0, "+U"), OpEv(3, 30.0, "-D"))
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, path)
    val rows = t.toDF.orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 25.0)), s"got $rows")
    // the audit log surfaces the raw -D
    val kinds = t.auditLog.filter(col("event_id") === 3)
      .select("_row_kind").collect().map(_.getString(0)).toSet
    assert(kinds.contains("-D"), s"audit log kinds for key 3: $kinds")
  }

  test("DSv2 StreamingWrite: writeStream.toTable round trip, exactly-once epochs") {
    implicit val sql = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-swh").toString
    spark.conf.set("spark.sql.catalog.gsw", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsw.db")
    spark.sql(
      """CREATE TABLE gsw.db.sw (event_id BIGINT, user_id BIGINT, version BIGINT,
        | value DOUBLE) USING graft TBLPROPERTIES ('primary-key'='event_id')""".stripMargin)
    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .trigger(Trigger.ProcessingTime(100))
      .toTable("gsw.db.sw")
    try {
      input.addData(Ev(1, 10, 1, 1.0), Ev(2, 10, 1, 2.0))
      q.processAllAvailable()
      input.addData(Ev(2, 10, 2, 22.0), Ev(3, 10, 1, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT event_id, value FROM gsw.db.sw ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 22.0), (3L, 3.0)), s"got $got")
    val t = GraftTable.load(spark, s"$wh/db/sw")
    assert(t.store.latestSnapshot.get.maxCommitIdentifiers.values.max == 1L,
      "each epoch commits exactly once")
    // staging fully cleaned up
    val leftovers = new java.io.File(s"$wh/db/sw").listFiles()
      .filter(_.getName.startsWith("tmp-streaming"))
    assert(leftovers.isEmpty, s"staging dirs left behind: ${leftovers.mkString(",")}")
  }

  test("CDC ingestion recipe: Kafka-shaped JSON → rowkind apply → changelog out") {
    // The capability equivalent of the reference's CDC sync actions
    // (paimon-flink-cdc MySqlSyncTableAction), expressed Spark-first: a
    // stream of Kafka-style JSON values carrying an op column is parsed
    // with from_json and applied to a PK table through rowkind.field, with
    // changelog-producer=lookup computing exact -U/+U images at write time;
    // schema evolution is an explicit addColumn between deployments.
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val v1Schema = "id BIGINT, name STRING, op STRING"
    def start(parseSchema: String) = input.toDF()
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL(parseSchema)).as("r"))
      .select("r.*")
      .writeStream.format("graft")
      .option("path", path)
      .option("primary-keys", "id")
      .option("rowkind.field", "op")
      .option("changelog-producer", "lookup")
      .option("bucket", "2")
      .option("checkpointLocation", path + "-ckpt")
      .trigger(Trigger.ProcessingTime(100))
      .start()

    // deployment 1: inserts, then a CDC batch with update + delete
    val q1 = start(v1Schema)
    try {
      input.addData(
        """{"id":1,"name":"ann","op":"+I"}""",
        """{"id":2,"name":"bob","op":"+I"}""",
        """{"id":3,"name":"cat","op":"+I"}""")
      q1.processAllAvailable()
      input.addData(
        """{"id":2,"name":"bo","op":"+U"}""",
        """{"id":3,"name":"cat","op":"-D"}""")
      q1.processAllAvailable()
    } finally q1.stop()

    val t = GraftTable.load(spark, path)
    assert(t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "ann"), (2L, "bo")))
    // lookup producer emitted exact retraction images for the CDC batch
    val change = t.incremental(1, 2).select("_row_kind", "id", "name")
      .orderBy("id", "_row_kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(change == Seq(("+U", 2L, "bo"), ("-U", 2L, "bob"), ("-D", 3L, "cat")),
      s"lookup changelog was $change")

    // deployment 2: upstream added a column — evolve, restart with the
    // wider parse schema, same checkpoint
    t.addColumn("email", org.apache.spark.sql.types.StringType)
    val q2 = start(v1Schema + ", email STRING")
    try {
      input.addData("""{"id":4,"name":"dan","op":"+I","email":"d@x"}""")
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = GraftTable.load(spark, path).toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)).orNull)).toSeq
    assert(rows == Seq((1L, "ann", null), (2L, "bo", null), (4L, "dan", "d@x")),
      s"got $rows")
  }

  test("graft source: snapshot deltas stream out with row kinds; AvailableNow terminates") {
    val path = tmpTable()
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = GraftTable.create(spark, path, src.schema, primaryKeys = Seq("k"))
    t.upsert(src)
    t.upsert(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"))

    // from-snapshot: a pure delta replay, every version streams out
    val out = spark.readStream.format("graft").option("path", path)
      .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
      .load()
      .writeStream.format("memory").queryName("graft_stream_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(out.awaitTermination(60000), "AvailableNow must terminate")

    val got = spark.table("graft_stream_out")
      .select("_row_kind", "_sequence_number", "k", "v")
      .orderBy("_sequence_number", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      ("+I", 1L, 1L, "a"), ("+I", 1L, 2L, "b"),
      ("+I", 2L, 2L, "b2"), ("+I", 2L, 3L, "c")))

    // latest-full (default): the FIRST batch is the full MERGED state —
    // one row per live key, not a delta replay (survives expired history)
    val full = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("graft_stream_full")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(full.awaitTermination(60000))
    val fullGot = spark.table("graft_stream_full")
      .select("_row_kind", "_sequence_number", "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(fullGot == Seq(
      ("+I", 2L, 1L, "a"), ("+I", 2L, 2L, "b2"), ("+I", 2L, 3L, "c")), s"got $fullGot")
  }

  test("full-compaction changelog producer emits exact -U/+U/-D stream") {
    val path = tmpTable()
    val df1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val t = GraftTable.create(spark, path, df1.schema, primaryKeys = Seq("k"),
      options = Map("changelog-producer" -> "full-compaction", "bucket" -> "2"))
    t.upsert(df1)
    t.compact() // snapshot 2: first compaction → all keys +I
    val first = t.incremental(1, 2).select("_row_kind", "k", "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(first.toSeq == Seq(("+I", 1L, "a"), ("+I", 2L, "b"), ("+I", 3L, "c")))

    // update key 2, delete key 3, add key 4 → compact → exact diff
    t.upsert(Seq((2L, "b2"), (4L, "d")).toDF("k", "v"))
    t.upsert(Seq((3L, "c")).toDF("k", "v"), kinds = Some(lit(GraftMeta.KindDelete)))
    t.compact() // snapshot 5
    val diff = t.incremental(4, 5)
      .select("_row_kind", "k", "v").orderBy("k", "_row_kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(diff.toSeq == Seq(
      ("+U", 2L, "b2"), ("-U", 2L, "b"), ("-D", 3L, "c"), ("+I", 4L, "d")))
  }

  test("latest-full survives snapshot expiration where a delta replay loses rows") {
    val path = tmpTable()
    val df = Seq((1L, "a")).toDF("k", "v")
    val t = GraftTable.create(spark, path, df.schema, primaryKeys = Seq("k"))
    t.upsert(df)
    t.upsert(Seq((2L, "b")).toDF("k", "v"))
    t.upsert(Seq((3L, "c")).toDF("k", "v"))
    t.expireSnapshots(retainLast = 1) // snapshots 1-2 gone from the chain
    val out = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("expired_full_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(out.awaitTermination(60000))
    val got = spark.table("expired_full_out").select("k").orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L),
      s"full first batch must see rows whose commit snapshots expired; got $got")
  }

  test("changelog-producer.row-deduplicate suppresses no-op -U/+U pairs") {
    def mk(dedup: Boolean): GraftTable = {
      val path = tmpTable()
      val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val t = GraftTable.create(spark, path, df.schema, primaryKeys = Seq("k"),
        options = Map("changelog-producer" -> "lookup",
          "changelog-producer.row-deduplicate" -> dedup.toString))
      t.upsert(df)
      t.upsert(Seq((1L, "a"), (2L, "b2")).toDF("k", "v")) // 1 is a no-op
      t
    }
    // reference default (false): the touched-but-unchanged key 1 emits
    val loud = mk(dedup = false).incremental(1, 2)
      .select("_row_kind", "k", "v").orderBy("k", "_row_kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(loud == Seq(("+U", 1L, "a"), ("-U", 1L, "a"),
      ("+U", 2L, "b2"), ("-U", 2L, "b")), s"got $loud")
    // row-deduplicate=true: only the real change emits
    val quiet = mk(dedup = true).incremental(1, 2)
      .select("_row_kind", "k", "v").orderBy("k", "_row_kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(quiet == Seq(("+U", 2L, "b2"), ("-U", 2L, "b")), s"got $quiet")
  }

  test("ignore-delete: -D records dropped at write and at merge time") {
    val path = tmpTable()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = GraftTable.create(spark, path, df.schema, primaryKeys = Seq("k"),
      options = Map("ignore-delete" -> "true"))
    t.upsert(df)
    t.upsert(Seq((1L, "a")).toDF("k", "v"), kinds = Some(lit(GraftMeta.KindDelete)))
    t.upsert(Seq((2L, "b2")).toDF("k", "v"))
    val rows = t.toDF.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2")), s"got $rows")
    // merge-time check: enable on a table that ALREADY holds a retract
    val path2 = tmpTable()
    val t2 = GraftTable.create(spark, path2, df.schema, primaryKeys = Seq("k"))
    t2.upsert(df)
    t2.upsert(Seq((1L, "a")).toDF("k", "v"), kinds = Some(lit(GraftMeta.KindDelete)))
    assert(t2.toDF.count() == 1)
    t2.setOption("ignore-delete", "true")
    val t2b = GraftTable.load(spark, path2)
    val revived = t2b.toDF.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(revived == Seq((1L, "a"), (2L, "b")), s"got $revived")
  }

  test("v2 streaming: readStream.table with admission control and AvailableNow") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gs", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    spark.sql(
      """CREATE TABLE gs.db.st (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'read.max-rows-per-batch' = '2',
        |  'scan.mode' = 'from-snapshot', 'scan.snapshot-id' = '1')""".stripMargin)
    spark.sql("INSERT INTO gs.db.st VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gs.db.st VALUES (3, 'c')")
    spark.sql("INSERT INTO gs.db.st VALUES (2, 'b2'), (4, 'd')")

    val q = spark.readStream.table("gs.db.st")
      .writeStream.format("memory").queryName("v2_stream_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must terminate")
    // admission control: 3 snapshots with max 2 rows/batch → multiple batches
    assert(q.recentProgress.length >= 2, "row limit should split the backlog")
    val got = spark.table("v2_stream_out").orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (4L, "d")))
  }

  test("v2 streaming: reader-side scan.mode=from-timestamp and compacted-full") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gs2", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs2.db")
    spark.sql(
      """CREATE TABLE gs2.db.sm (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'write-only' = 'true')""".stripMargin)
    spark.sql("INSERT INTO gs2.db.sm VALUES (1, 'a'), (2, 'b')") // snap 1
    Thread.sleep(30)
    val betweenTs = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO gs2.db.sm VALUES (3, 'c')")           // snap 2
    spark.sql("INSERT INTO gs2.db.sm VALUES (2, 'b2')")          // snap 3

    // reader-side from-timestamp through the DSv2 MicroBatchStream: only
    // snapshots committed after betweenTs stream out (no TBLPROPERTIES)
    val q = spark.readStream
      .option("scan.mode", "from-timestamp")
      .option("scan.timestamp-millis", betweenTs.toString)
      .table("gs2.db.sm")
      .writeStream.format("memory").queryName("v2_ts_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(q.awaitTermination(60000))
    val got = spark.table("v2_ts_out").orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "b2"), (3L, "c")),
      s"deltas after the timestamp only, got $got")

    // compacted-full: full state of the latest COMPACT snapshot first,
    // deltas after it
    val t = graft.table.GraftTable.load(spark, s"$wh/db/sm")
    t.compact()                                                  // snap 4
    spark.sql("INSERT INTO gs2.db.sm VALUES (4, 'd')")           // snap 5
    val q2 = spark.readStream
      .option("scan.mode", "compacted-full")
      .table("gs2.db.sm")
      .writeStream.format("memory").queryName("v2_cf_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(q2.awaitTermination(60000))
    val got2 = spark.table("v2_cf_out").orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got2 == Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")),
      s"compacted state + post-compaction delta, got $got2")
  }

  test("two independent streaming writers: overlapping epoch ids never skip batches") {
    import spark.implicits._
    val sink = tmpTable()
    def streamIn(rows: Seq[(Long, String)], ckpt: String): Unit = {
      val srcPath = tmpTable()
      val src = GraftTable.create(spark, srcPath,
        rows.toDF("k", "v").schema, options = Map("write-only" -> "true"))
      src.append(rows.toDF("k", "v"))
      val q = spark.readStream.format("graft").option("path", srcPath).load()
        .drop("_row_kind", "_sequence_number")
        .writeStream.format("graft")
        .option("path", sink)
        .option("primary-keys", "k")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
    }
    // both queries start at batchId 0 — per-writer exactly-once scope
    // (commitUser) must keep them independent
    streamIn(Seq((1L, "a"), (2L, "b")), tmpTable() + "-ckA")
    streamIn(Seq((3L, "c")), tmpTable() + "-ckB")
    val got = GraftTable.load(spark, sink).toDF
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      s"the second writer's batch 0 must not be skipped: $got")
  }

  test("consumer-id resume: a fresh query continues from durable progress") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gs3", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs3.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs3.db")
    spark.sql(
      """CREATE TABLE gs3.db.cr (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'write-only' = 'true')""".stripMargin)
    spark.sql("INSERT INTO gs3.db.cr VALUES (1, 'a'), (2, 'b')")

    def drain(query: String, ckpt: String, ignoreProgress: Boolean = false): Seq[Long] = {
      var r = spark.readStream.option("consumer-id", "app7")
      if (ignoreProgress) r = r.option("consumer.ignore-progress", "true")
      val q = r.table("gs3.db.cr")
        .writeStream.format("memory").queryName(query)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(60000))
      spark.table(query).select("k").collect().map(_.getLong(0)).sorted.toSeq
    }

    // first query: full drain; the final AvailableNow probe advances the
    // durable consumer past the last processed batch
    assert(drain("cr_out1", tmpTable() + "-ck1") == Seq(1L, 2L))
    val t = graft.table.GraftTable.load(spark, s"$wh/db/cr")
    assert(t.store.readConsumer("app7").contains(2L),
      s"consumer advanced past the processed batch: ${t.store.readConsumer("app7")}")
    spark.sql("INSERT INTO gs3.db.cr VALUES (3, 'c')")
    // NEW query, NEW checkpoint, same consumer: only the new commit streams
    assert(drain("cr_out2", tmpTable() + "-ck2") == Seq(3L),
      "resumed from durable consumer progress, not a full replay")
    // ignore-progress opts back into the scan mode's from-scratch read
    assert(drain("cr_out3", tmpTable() + "-ck3", ignoreProgress = true) ==
      Seq(1L, 2L, 3L))
  }

  test("scan.bounded.watermark caps the stream below the first larger-watermark snapshot") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gs4", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs4.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs4.db")
    spark.sql(
      """CREATE TABLE gs4.db.bw (k BIGINT, ts BIGINT) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'write-only' = 'true',
        |  'watermark.column' = 'ts')""".stripMargin)
    spark.sql("INSERT INTO gs4.db.bw VALUES (1, 100)") // snap 1, wm 100
    spark.sql("INSERT INTO gs4.db.bw VALUES (2, 300)") // snap 2, wm 300
    spark.sql("INSERT INTO gs4.db.bw VALUES (3, 700)") // snap 3, wm 700
    val q = spark.readStream
      .option("scan.bounded.watermark", "400")
      .table("gs4.db.bw")
      .writeStream.format("memory").queryName("bw_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(q.awaitTermination(60000))
    val got = spark.table("bw_out").select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L),
      s"the wm-700 snapshot is past the bound and never emitted: $got")
  }

  test("streaming start modes: from-timestamp and from-watermark") {
    val path = tmpTable()
    val df1 = Seq((1L, 100L, "a")).toDF("k", "ts", "v")
    val t = GraftTable.create(spark, path, df1.schema, primaryKeys = Seq("k"),
      options = Map("watermark.column" -> "ts"))
    t.upsert(df1)                                    // snap 1, wm 100
    Thread.sleep(20)
    t.upsert(Seq((2L, 300L, "b")).toDF("k", "ts", "v")) // snap 2, wm 300
    Thread.sleep(20)
    val betweenTs = System.currentTimeMillis()
    Thread.sleep(20)
    t.upsert(Seq((3L, 700L, "c")).toDF("k", "ts", "v")) // snap 3, wm 700

    // from-timestamp: start after the last snapshot committed <= betweenTs
    assert(t.streamingStartExclusive(Map(
      "scan.mode" -> "from-timestamp",
      "scan.timestamp-millis" -> betweenTs.toString)) == 2L)
    // from-watermark: first snapshot whose watermark reached 300 is snap 2
    assert(t.streamingStartExclusive(Map(
      "scan.mode" -> "from-watermark", "scan.watermark" -> "300")) == 1L)
    // watermark beyond the chain head: nothing to replay yet
    assert(t.streamingStartExclusive(Map(
      "scan.mode" -> "from-watermark", "scan.watermark" -> "9999")) == 3L)
    // from-tag: deltas from the tagged snapshot onward
    t.store.createTag("cut", 2L)
    assert(t.streamingStartExclusive(Map(
      "scan.mode" -> "from-tag", "scan.tag-name" -> "cut")) == 1L)

    // end-to-end through the DSv1 source: only snapshot 3 streams out
    val out = spark.readStream.format("graft").option("path", path)
      .option("scan.mode", "from-timestamp")
      .option("scan.timestamp-millis", betweenTs.toString)
      .load()
      .writeStream.format("memory").queryName("start_mode_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(out.awaitTermination(60000))
    val got = spark.table("start_mode_out").select("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L), s"expected only snapshot 3's rows, got $got")
  }

  test("watermark.column: snapshot watermarks populate from file stats, stay monotone") {
    val path = tmpTable()
    val df1 = Seq((1L, 100L, "x"), (2L, 300L, "y")).toDF("k", "ts", "v")
    val t = GraftTable.create(spark, path, df1.schema, primaryKeys = Seq("k"),
      options = Map("watermark.column" -> "ts"))
    t.upsert(df1)
    assert(t.store.latestSnapshot.get.watermark.contains(300L))
    // late batch: watermark must not regress
    t.upsert(Seq((3L, 200L, "z")).toDF("k", "ts", "v"))
    assert(t.store.latestSnapshot.get.watermark.contains(300L))
    t.upsert(Seq((4L, 500L, "w")).toDF("k", "ts", "v"))
    assert(t.store.latestSnapshot.get.watermark.contains(500L))
  }

  test("streaming read across schema evolution: old snapshots remap to the current schema") {
    val path = tmpTable()
    val df1 = Seq((1L, "a")).toDF("k", "v")
    val t = GraftTable.create(spark, path, df1.schema, primaryKeys = Seq("k"))
    t.upsert(df1)
    t.addColumn("score", org.apache.spark.sql.types.DoubleType)
    val t2 = GraftTable.load(spark, path)
    t2.upsert(Seq((2L, "b", 9.5)).toDF("k", "v", "score"))

    val out = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("evo_stream_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    assert(out.awaitTermination(60000))
    val got = spark.table("evo_stream_out").select("k", "v", "score")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    // pre-evolution file null-fills the added column; both snapshots stream
    assert(got == Seq((1L, "a", null), (2L, "b", 9.5)), got.toString)
  }

  test("lookup join: fresh sees dim upserts between batches, pinned does not") {
    import graft.streaming.LookupJoin
    implicit val sql = spark.sqlContext
    val dimPath = tmpTable()
    val dimV1 = Seq((10L, "gold"), (20L, "silver")).toDF("cust_id", "tier")
    val dim = GraftTable.create(spark, dimPath, dimV1.schema, primaryKeys = Seq("cust_id"))
    dim.upsert(dimV1)

    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("order_id", "cust_id")

    val freshQ = LookupJoin.fresh(stream, spark, dimPath, Seq("cust_id"))
      .writeStream.format("memory").queryName("lookup_fresh")
      .option("checkpointLocation", tmpTable() + "-ckpt")
      .start()
    val pinnedQ = LookupJoin.pinned(stream, dim, Seq("cust_id"))
      .writeStream.format("memory").queryName("lookup_pinned")
      .option("checkpointLocation", tmpTable() + "-ckpt2")
      .start()
    try {
      input.addData((1L, 10L))
      freshQ.processAllAvailable(); pinnedQ.processAllAvailable()
      // dim upsert BETWEEN batches: 10 promotes, 30 appears
      dim.upsert(Seq((10L, "platinum"), (30L, "bronze")).toDF("cust_id", "tier"))
      input.addData((2L, 10L), (3L, 30L))
      freshQ.processAllAvailable(); pinnedQ.processAllAvailable()
    } finally { freshQ.stop(); pinnedQ.stop() }

    def got(name: String) = spark.table(name)
      .select("order_id", "tier").orderBy("order_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("null"))).toSeq
    // fresh: batch 2 re-resolved the snapshot — promoted tier + new key join
    assert(got("lookup_fresh") ==
      Seq((1L, "gold"), (2L, "platinum"), (3L, "bronze")))
    // pinned: batch 2 still joins the snapshot from join-build time
    assert(got("lookup_pinned") ==
      Seq((1L, "gold"), (2L, "gold"), (3L, "null")))
  }
}
