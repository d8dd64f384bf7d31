package graft

import graft.table.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming lineage (reference: the SourceTableLineage / SinkTableLineage
  * system-table trio): graft sources and sinks record job→table edges into
  * the table's own lineage/ metadata, surfaced by the $source_lineage /
  * $sink_lineage system tables and the catalog-level
  * source_table_lineage / sink_table_lineage views.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("sink records one edge per committed epoch; source records its run") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream.format("graft")
      .option("path", path)
      .option("primary-keys", "k")
      .option("checkpointLocation", path + "-ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .queryName("lineage_writer")
      .start()
    try {
      input.addData((1L, "a"))
      q.processAllAvailable()
      input.addData((2L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, path)
    val sinks = t.system("sink_lineage").orderBy("snapshot_id").collect()
    assert(sinks.length == 2, s"one edge per epoch: ${sinks.mkString(";")}")
    assert(sinks.map(_.getLong(1)).toSeq == Seq(1L, 2L), "snapshot ids recorded")
    assert(sinks.map(_.getLong(2)).toSeq == Seq(0L, 1L), "epoch (barrier) ids")
    assert(sinks.forall(_.getString(0) == q.id.toString),
      s"job is the streaming query id: ${sinks.map(_.getString(0)).toSeq} vs ${q.id}")

    // a streaming READ registers a source edge for its run
    val out = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("lineage_reader_out")
      .option("checkpointLocation", path + "-rckpt")
      .trigger(Trigger.AvailableNow()).start()
    out.awaitTermination(60000)
    val sources = t.system("source_lineage").collect()
    assert(sources.nonEmpty, "source edge recorded")
    assert(sources.exists(_.getString(0) == out.id.toString),
      s"source job ids: ${sources.map(_.getString(0)).toSeq} vs ${out.id}")
  }

  test("catalog-level lineage view aggregates across warehouse tables") {
    implicit val sql = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-lineage-wh").toString
    val path = s"$wh/db/lin_t"
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream.format("graft")
      .option("path", path).option("primary-keys", "k")
      .option("checkpointLocation", s"$path-ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData((1L, "a")); q.processAllAvailable()
    } finally q.stop()
    val agg = graft.table.CatalogSystemTables.tableLineage(spark, wh, "sink").collect()
    assert(agg.length == 1)
    assert(agg(0).getString(0) == "db" && agg(0).getString(1) == "lin_t")
    assert(agg(0).getLong(3) == 1L)
  }

  test("expiration prunes lineage along the snapshot horizon") {
    implicit val sql = spark.sqlContext
    val path = tmpTable()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream.format("graft")
      .option("path", path).option("primary-keys", "k")
      .option("write-only", "true")
      .option("checkpointLocation", path + "-ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      (1 to 5).foreach { i => input.addData((i.toLong, s"v$i")); q.processAllAvailable() }
    } finally q.stop()
    val t = GraftTable.load(spark, path)
    assert(t.system("sink_lineage").count() == 5)
    t.expireSnapshots(retainLast = 2) // keeps snapshots 4,5
    val left = t.system("sink_lineage").collect().map(_.getLong(1)).sorted
    assert(left.toSeq == Seq(4L, 5L), s"pruned to the retained horizon: ${left.toSeq}")
  }
}
