package graft

import graft.cdc.JsonCdcIngest
import graft.table.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The schema-evolving JSON CDC ingest job (graft.cdc.JsonCdcIngest) —
  * the Spark-form equivalent of the reference's CDC sync actions
  * (paimon-flink-cdc): op routing, automatic mid-stream column addition,
  * Debezium envelopes, and exactly-once across restarts.
  */
class CdcIngestSpec extends SparkSpec {
  import spark.implicits._

  test("flat frames: ops apply, a mid-stream NEW column auto-adds, nulls backfill") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val q = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = path + "-ckpt",
      tableOptions = Map("bucket" -> "2"))
    try {
      input.addData(
        """{"id":1,"name":"ann","op":"+I"}""",
        """{"id":2,"name":"bob","op":"+I"}""",
        """{"id":3,"name":"cat","op":"+I"}""")
      q.processAllAvailable()
      // upstream added `email` — no restart, no manual DDL
      input.addData(
        """{"id":2,"name":"bo","email":"b@x","op":"+U"}""",
        """{"id":3,"name":"cat","op":"-D"}""",
        """{"id":4,"name":"dan","email":"d@x","op":"+I"}""")
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, path)
    assert(t.schema.fields.map(_.name).contains("email"),
      "mid-stream column auto-added to the table schema")
    val rows = t.toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("name"), r.getAs[String]("email")))
    assert(rows.toSeq == Seq((1L, "ann", null), (2L, "bo", "b@x"),
      (4L, "dan", "d@x")), rows.mkString(";"))
  }

  test("restart from the checkpoint resumes without duplicating the replayed epoch") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val ckpt = path + "-ckpt"
    val input = MemoryStream[String]
    def startQ() = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = ckpt,
      tableOptions = Map("bucket" -> "2"))
    val q1 = startQ()
    try {
      input.addData("""{"id":1,"n":10,"op":"+I"}""", """{"id":2,"n":20,"op":"+I"}""")
      q1.processAllAvailable()
    } finally q1.stop()
    val snapAfter1 = GraftTable.load(spark, path).store.latestSnapshotId.get
    // restart: MemoryStream data re-offers the SAME offsets → the replayed
    // batch carries the same batchId and must be skipped (no new snapshot,
    // no duplicate rows); genuinely new data then lands normally
    val q2 = startQ()
    try {
      input.addData("""{"id":3,"n":30,"op":"+I"}""")
      q2.processAllAvailable()
    } finally q2.stop()
    val t = GraftTable.load(spark, path)
    val rows = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"no loss, no duplicates: ${rows.mkString(";")}")
    assert(t.store.latestSnapshotId.get > snapAfter1, "new data did commit")
    // direct replay of an already-committed epoch is a no-op
    val before = t.store.latestSnapshotId.get
    JsonCdcIngest.applyBatch(spark,
      Seq("""{"id":9,"n":90,"op":"+I"}""").toDF("value"), path, Seq("id"),
      JsonCdcIngest.Envelope.Flat, "op", Map.empty, commitUser = "json-cdc-ingest",
      batchId = 0L)
    assert(GraftTable.load(spark, path).store.latestSnapshotId.get == before,
      "replayed (commitUser, batchId) must not commit")
    assert(t.toDF.filter(col("id") === 9).count() == 0)
  }

  test("mid-stream numeric widening: int-looking column later carries doubles") {
    // JSON inference types the first batch's `score` as BIGINT; the second
    // batch carries a fractional value → the schema merge widens the
    // TABLE column to DOUBLE and earlier rows read back widened
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val q = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = path + "-ckpt")
    try {
      input.addData("""{"id":1,"score":10,"op":"+I"}""")
      q.processAllAvailable()
      input.addData("""{"id":2,"score":2.5,"op":"+I"}""")
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, path)
    assert(t.schema.fieldByName("score").sparkType ==
      org.apache.spark.sql.types.DoubleType, t.schema.fields.mkString(","))
    val rows = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 2.5)), rows.mkString(";"))
  }

  test("debezium envelopes: c/r/u/d route through before/after images") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val q = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = path + "-ckpt",
      envelope = JsonCdcIngest.Envelope.Debezium)
    try {
      input.addData(
        """{"op":"r","before":null,"after":{"id":1,"v":"snap"}}""",
        """{"op":"c","before":null,"after":{"id":2,"v":"new"}}""")
      q.processAllAvailable()
      input.addData(
        """{"op":"u","before":{"id":2,"v":"new"},"after":{"id":2,"v":"upd"}}""",
        """{"op":"d","before":{"id":1,"v":"snap"},"after":null}""")
      q.processAllAvailable()
    } finally q.stop()
    val rows = GraftTable.load(spark, path).toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "upd")), rows.mkString(";"))
  }

  test("debezium: a pk-changing update deletes the before image (no stale old-PK row)") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val q = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = path + "-ckpt",
      envelope = JsonCdcIngest.Envelope.Debezium)
    try {
      input.addData(
        """{"op":"c","before":null,"after":{"id":1,"v":"one"}}""",
        """{"op":"c","before":null,"after":{"id":2,"v":"two"}}""")
      q.processAllAvailable()
      input.addData(
        // upstream UPDATE rewrote the pk 1 → 5: row 1 must NOT stay live
        """{"op":"u","before":{"id":1,"v":"one"},"after":{"id":5,"v":"one-moved"}}""",
        // same-pk update: before image must NOT be deleted
        """{"op":"u","before":{"id":2,"v":"two"},"after":{"id":2,"v":"two-upd"}}""")
      q.processAllAvailable()
    } finally q.stop()
    val rows = GraftTable.load(spark, path).toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "two-upd"), (5L, "one-moved")), rows.mkString(";"))
  }

  test("debezium: old pk recycled in the SAME batch — event order decides") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[String]
    val q = JsonCdcIngest.start(spark, input.toDF(), path,
      primaryKeys = Seq("id"), checkpoint = path + "-ckpt",
      envelope = JsonCdcIngest.Envelope.Debezium)
    try {
      input.addData(
        """{"op":"c","before":null,"after":{"id":1,"v":"orig"}}""",
        """{"op":"c","before":null,"after":{"id":10,"v":"other"}}""")
      q.processAllAvailable()
      // u(1->5) THEN c(1): the re-created id=1 must survive the key-change
      // delete of the before image
      input.addData(
        """{"op":"u","before":{"id":1,"v":"orig"},"after":{"id":5,"v":"moved"}}""",
        """{"op":"c","before":null,"after":{"id":1,"v":"recycled"}}""")
      q.processAllAvailable()
      // c(2) THEN u(2->6) in one batch: id=2 existed only transiently and
      // must end DELETED even though the batch also inserted it
      input.addData(
        """{"op":"c","before":null,"after":{"id":2,"v":"transient"}}""",
        """{"op":"u","before":{"id":2,"v":"transient"},"after":{"id":6,"v":"settled"}}""")
      q.processAllAvailable()
    } finally q.stop()
    val rows = GraftTable.load(spark, path).toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "recycled"), (5L, "moved"), (6L, "settled"),
      (10L, "other")), rows.mkString(";"))
  }
}
