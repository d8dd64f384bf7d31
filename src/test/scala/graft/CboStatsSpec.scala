package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Post-merge CBO row/size estimates for PK tables: un-merged update runs
  * must not inflate numRows/sizeInBytes to runs× the true cardinality
  * (which flips broadcastable joins to shuffles at scale).
  */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-cbo-wh").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.cbo", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cbo.db")
  }

  private def stats(table: String) =
    spark.table(table).queryExecution.optimizedPlan.stats

  test("compacted-then-updated PK table reports numRows within 1.2x of true count") {
    spark.sql(
      """CREATE TABLE cbo.db.hot (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2',
        | 'write-only' = 'true')""".stripMargin)
    val t = GraftTable.load(spark, s"$wh/db/hot")
    val base = (0L until 2000L).map(k => (k, s"v$k")).toDF("k", "v")
    t.upsert(base)
    t.compact()
    // five rounds of churn over the SAME keys: raw sum is now ~6x true
    (1 to 5).foreach { r =>
      t.upsert((0L until 400L).map(k => (k * 5, s"r$r")).toDF("k", "v"))
    }
    val trueCount = spark.table("cbo.db.hot").count()
    assert(trueCount == 2000L)
    val est = stats("cbo.db.hot").rowCount
      .getOrElse(fail("scan must report a row count")).toLong
    assert(est <= (trueCount * 1.2).toLong,
      s"post-merge estimate $est must stay within 1.2x of $trueCount")
    assert(est >= trueCount, s"estimate $est must not undercount $trueCount")
  }

  test("ANALYZE pins the exact post-merge count; disjoint-run appends still add exactly") {
    // ANALYZE on the churned table gives the exact count for the current
    // snapshot (the heuristic path is only the fallback)
    val t = GraftTable.load(spark, s"$wh/db/hot")
    t.analyzeColumns()
    val est = stats("cbo.db.hot").rowCount.get.toLong
    assert(est == 2000L, s"current-snapshot ANALYZE is authoritative: $est")

    // key-disjoint sorted runs (pure inserts in separate ranges) must ADD
    // exactly — no discount applies across disjoint sections
    spark.sql(
      """CREATE TABLE cbo.db.cold (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '1',
        | 'write-only' = 'true')""".stripMargin)
    val cold = GraftTable.load(spark, s"$wh/db/cold")
    cold.upsert((0L until 1000L).map(k => (k, "a")).toDF("k", "v"))
    cold.upsert((1000L until 2000L).map(k => (k, "b")).toDF("k", "v"))
    cold.upsert((2000L until 3000L).map(k => (k, "c")).toDF("k", "v"))
    val estCold = stats("cbo.db.cold").rowCount.get.toLong
    assert(estCold == 3000L, s"disjoint runs add exactly: $estCold")
  }

  test("a broadcastable churned dim BROADCASTS (raw byte sum would shuffle it)") {
    spark.sql(
      """CREATE TABLE cbo.db.dim (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '1',
        | 'write-only' = 'true')""".stripMargin)
    val dim = GraftTable.load(spark, s"$wh/db/dim")
    val pad = "x" * 64
    dim.upsert((0L until 3000L).map(k => (k, pad)).toDF("k", "v"))
    dim.compact()
    (1 to 8).foreach { r =>
      dim.upsert((0L until 3000L).map(k => (k, s"$pad$r")).toDF("k", "v"))
    }
    val s = stats("cbo.db.dim")
    val rawBytes = GraftTable.load(spark, s"$wh/db/dim")
      .store.latestSnapshot.map(sn =>
        GraftTable.load(spark, s"$wh/db/dim").store.liveFiles(sn).map(_.size).sum).get
    assert(s.sizeInBytes.toLong < rawBytes,
      s"size estimate ${s.sizeInBytes} must discount the raw sum $rawBytes")

    // pick a broadcast threshold BETWEEN the discounted estimate and the
    // raw sum: with the discount the dim broadcasts; the raw sum would not
    val threshold = (s.sizeInBytes.toLong + rawBytes) / 2
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      val facts = (0L until 10000L).map(k => (k % 3000L, k)).toDF("k", "fact")
      val joined = facts.join(spark.table("cbo.db.dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"discounted dim must broadcast under threshold=$threshold raw=$rawBytes est=${s.sizeInBytes}:\n$plan")
      assert(joined.count() == 10000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
