package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Bucketed APPEND tables — BucketMode.HASH_FIXED on a non-pk table
  * (reference: AppendOnlyFileStore.java:67-69): hash(bucket-key) % bucket
  * routing, bucket pruning on reads, storage-partitioned joins, and
  * bucket-preserving maintenance.
  */
class AppendBucketSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(path: String, buckets: Int = 4): GraftTable = {
    val df = (1L to 400L).map(i => (i, s"u${i % 7}", i * 1.5)).toDF("id", "user", "v")
    val t = GraftTable.create(spark, path, df.schema,
      options = Map("bucket-key" -> "id", "bucket" -> buckets.toString))
    t.append(df)
    t
  }

  test("append routes by hash(bucket-key) % n; reads round-trip") {
    val t = mkTable(tmpTable())
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.map(_.bucket).distinct.size > 1, "rows spread over buckets")
    assert(live.forall(f => f.path.contains("__bucket=")), "bucket dirs in layout")
    assert(t.toDF.count() == 400)
    assert(!t.toDF.columns.contains(graft.GraftMeta.BucketCol), "bucket col hidden")
    assert(t.toDF.agg(sum("v")).collect()(0).getDouble(0) ==
      (1L to 400L).map(_ * 1.5).sum)
  }

  test("bucket pruning: bucket-key equality scans one bucket, IN-list bounded") {
    val t = mkTable(tmpTable())
    val pruned = graft.spark.GraftFileIndex.bucketsFromFilters(
      t.schema, Seq(EqualTo("id", 37L)))
    assert(pruned.exists(_.size == 1), s"expected one bucket, got $pruned")
    // a non-bucket-key predicate cannot prune
    assert(graft.spark.GraftFileIndex.bucketsFromFilters(
      t.schema, Seq(EqualTo("user", "u3"))).isEmpty)
    // end-to-end
    assert(t.toDF.filter(col("id") === 37L).count() == 1)
    assert(t.toDF.filter(col("id").isin(5L, 6L, 7L)).count() == 3)
  }

  test("SPJ: two bucketed append tables equi-join with zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-abk-wh").toString
    spark.conf.set("spark.sql.catalog.gabk", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gabk.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gabk.db")
    spark.sql(
      """CREATE TABLE gabk.db.fact (k BIGINT, v DOUBLE) USING graft
        |TBLPROPERTIES ('bucket-key' = 'k', 'bucket' = '4')""".stripMargin)
    spark.sql(
      """CREATE TABLE gabk.db.dim (k BIGINT, w STRING) USING graft
        |TBLPROPERTIES ('bucket-key' = 'k', 'bucket' = '4')""".stripMargin)
    spark.sql("INSERT INTO gabk.db.fact SELECT id, id * 1.0 FROM range(200)")
    spark.sql("INSERT INTO gabk.db.dim SELECT id, 'x' || id FROM range(200)")
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val df = spark.sql(
        "SELECT a.k, a.v, b.w FROM gabk.db.fact a JOIN gabk.db.dim b ON a.k = b.k")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed append equijoin must be storage-partitioned (no shuffle):\n$plan")
      assert(df.count() == 200)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compaction and sort compaction preserve the bucket layout") {
    val t = mkTable(tmpTable())
    // a second small append → small files to fold
    t.append(Seq((1000L, "u1", 1.0), (1001L, "u2", 2.0)).toDF("id", "user", "v"))
    val before = t.toDF.orderBy("id").collect()
    t.compactSmallFiles()
    val liveC = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(liveC.forall(f => f.path.contains("__bucket=")), "buckets survive compaction")
    // every file's rows hash to the file's own bucket
    assert(t.toDF.count() == 402)
    t.sortCompact(Seq("v"), "zorder")
    val liveZ = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(liveZ.forall(f => f.path.contains("__bucket=")), "buckets survive zorder")
    assert(t.toDF.orderBy("id").collect().sameElements(before))
    // pruning still sound after the rewrites
    assert(t.toDF.filter(col("id") === 1000L).count() == 1)
  }

  test("COW update re-routes a changed bucket-key; delete keeps layout") {
    val df = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      options = Map("bucket-key" -> "id", "bucket" -> "4"))
    t.append(df)
    // update the BUCKET KEY: the row must land in its new hash bucket, and
    // a pruned point lookup on the new value must find it
    t.update(col("id") === 42L, Map("id" -> lit(9042L)))
    assert(t.toDF.filter(col("id") === 9042L).count() == 1)
    assert(t.toDF.filter(col("id") === 42L).count() == 0)
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    // verify physically: the moved row's file bucket equals hash(9042)%4
    val moved = t.rawDF(live).filter(col("id") === 9042L)
      .select(col(graft.GraftMeta.BucketCol)).collect()
    assert(moved.length == 1)
    val expected = spark.range(1).select(
      pmod(hash(lit(9042L)), lit(4))).collect()(0).getInt(0)
    assert(moved(0).getInt(0) == expected, "row re-routed to its new bucket")
    t.delete(col("id") < 10L)
    assert(t.toDF.count() == 91)
    assert(t.store.liveFiles(t.store.latestSnapshot.get)
      .forall(f => f.path.contains("__bucket=")))
  }

  test("rescaleBucket rewrites an append table under the new bucket count") {
    val t = mkTable(tmpTable(), buckets = 2)
    t.rescaleBucket(8)
    assert(t.schema.numBuckets == 8)
    assert(t.toDF.count() == 400)
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live.map(_.bucket).distinct.size > 2, "rows spread over the new buckets")
    assert(t.toDF.filter(col("id") === 37L).count() == 1)
  }

  test("partitioned + bucketed append table: both pruning dimensions compose") {
    val df = (1L to 300L).map(i => (i, s"g${i % 3}", i * 2.0)).toDF("id", "grp", "v")
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      partitionKeys = Seq("grp"),
      options = Map("bucket-key" -> "id", "bucket" -> "4"))
    t.append(df)
    val live = t.store.liveFiles(t.store.latestSnapshot.get)
    // layout: grp=X/__bucket=N dirs
    assert(live.forall(f => f.path.contains("grp=") && f.path.contains("__bucket=")))
    assert(live.map(f => (f.partition, f.bucket)).distinct.size > 3)
    assert(t.toDF.count() == 300)
    // partition pruning alone, bucket pruning alone, and both together
    assert(t.toDF.filter(col("grp") === "g1").count() == 100)
    assert(t.toDF.filter(col("id") === 7L).count() == 1)
    assert(t.toDF.filter(col("grp") === "g1" && col("id") === 7L).count() == 1)
    assert(t.toDF.filter(col("grp") === "g1" && col("id") === 9L).count() == 0)
    // bucket-level pruning is exact on the bucket-key equality
    val pruned = graft.spark.GraftFileIndex.bucketsFromFilters(
      t.schema, Seq(org.apache.spark.sql.sources.EqualTo("id", 7L)))
    assert(pruned.exists(_.size == 1))
    // compaction preserves both dimensions
    t.append((1000L to 1001L).map(i => (i, "g0", 1.0)).toDF("id", "grp", "v"))
    t.compactSmallFiles()
    val liveC = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(liveC.forall(f => f.path.contains("grp=") && f.path.contains("__bucket=")))
    assert(t.toDF.count() == 302)
    // partition drop through SQL-style delete keeps the other partitions
    t.delete(col("grp") === "g2")
    assert(t.toDF.count() == 302 - 100)
  }

  test("scan reports pruning metrics on the DSv2 scan node") {
    val wh = java.nio.file.Files.createTempDirectory("graft-met-wh").toString
    spark.conf.set("spark.sql.catalog.gmet", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmet.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmet.db")
    spark.sql(
      """CREATE TABLE gmet.db.m (id BIGINT, flag STRING) USING graft
        |PARTITIONED BY (flag)""".stripMargin)
    spark.sql("INSERT INTO gmet.db.m SELECT id, 'a' FROM range(50)")
    spark.sql("INSERT INTO gmet.db.m SELECT id, 'b' FROM range(50)")
    val df = spark.sql("SELECT * FROM gmet.db.m WHERE flag = 'a'")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    // partition pruning skipped the 'b' file; both driver metrics surface
    assert(scan.metrics.contains("skippedTableFiles"))
    assert(scan.metrics("skippedTableFiles").value >= 1,
      s"expected skipped files, got ${scan.metrics("skippedTableFiles").value}")
    assert(scan.metrics("resultedTableFiles").value >= 1)
    assert(scan.metrics("numSplits").value >= 1)
  }

  test("validation: partition overlap, missing columns, mid-life enable rejected") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "pt", "v")
    intercept[IllegalArgumentException](GraftTable.create(spark, tmpTable(), df.schema,
      partitionKeys = Seq("pt"),
      options = Map("bucket-key" -> "pt", "bucket" -> "4")))
    intercept[IllegalArgumentException](GraftTable.create(spark, tmpTable(), df.schema,
      options = Map("bucket-key" -> "nope", "bucket" -> "4")))
    intercept[IllegalArgumentException](GraftTable.create(spark, tmpTable(), df.schema,
      options = Map("bucket-key" -> "id", "bucket" -> "-1")))
    // enabling bucketing on a populated unbucketed table is forbidden (old
    // files all sit in bucket 0 and would be wrongly pruned)
    val plain = GraftTable.create(spark, tmpTable(), df.schema)
    plain.append(df)
    intercept[UnsupportedOperationException](plain.setOption("bucket-key", "id"))
  }
}
