package graft

import org.apache.spark.sql.functions._

/** The spark_catalog wrapper: graft tables live in the session metastore
  * beside ordinary Spark tables (reference: SparkGenericCatalog).
  */
class SessionCatalogSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.spark_catalog",
      classOf[graft.spark.v2.GraftSessionCatalog].getName)
  }

  test("bucketed PK scans resolve the bucket function with explicit v2 " +
      "bucketing on (the Spark 4 registered default)") {
    // regression: with spark.sql.sources.v2.bucketing.enabled EXPLICITLY
    // true (any conf save/restore turns the registered default into an
    // explicit value), scans report bucket(n, pk) KeyGroupedPartitioning
    // and the function must resolve through THIS catalog, not fall through
    // to the metastore function registry (REQUIRES_SINGLE_PART_NAMESPACE)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val loc = tmpTable() + "-spjfn"
      spark.sql(
        s"""CREATE TABLE spark_catalog.default.gsc_spjfn (k BIGINT, v STRING) USING graft
           |LOCATION '$loc'
           |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2')""".stripMargin)
      spark.sql("INSERT INTO spark_catalog.default.gsc_spjfn VALUES (1, 'a'), (2, 'b')")
      val rows = spark.sql("SELECT k, v FROM spark_catalog.default.gsc_spjfn ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "a"), (2L, "b")))
      spark.sql("DROP TABLE spark_catalog.default.gsc_spjfn")
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("graft and non-graft tables coexist in spark_catalog") {
    val loc = tmpTable() + "-gsc"
    spark.sql(
      s"""CREATE TABLE spark_catalog.default.gsc_t (k BIGINT, v STRING) USING graft
         |LOCATION '$loc'
         |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2')""".stripMargin)
    spark.sql("INSERT INTO spark_catalog.default.gsc_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO spark_catalog.default.gsc_t VALUES (1, 'a2')")
    val rows = spark.sql("SELECT k, v FROM spark_catalog.default.gsc_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a2"), (2L, "b")), rows.mkString(","))
    // row-level command through the wrapper
    spark.sql("UPDATE spark_catalog.default.gsc_t SET v = 'x' WHERE k = 2")
    assert(spark.sql("SELECT v FROM spark_catalog.default.gsc_t WHERE k = 2")
      .head().getString(0) == "x")
    // the physical layout at the metastore location is a real graft table
    assert(graft.table.GraftTable.exists(spark, loc))

    // a plain parquet table delegates untouched
    val ploc = tmpTable() + "-plain"
    spark.sql(
      s"""CREATE TABLE spark_catalog.default.gsc_plain (k BIGINT) USING parquet
         |LOCATION '$ploc'""".stripMargin)
    spark.sql("INSERT INTO spark_catalog.default.gsc_plain VALUES (7)")
    assert(spark.sql("SELECT * FROM spark_catalog.default.gsc_plain").count() == 1)
    // both listed side by side
    val names = spark.sql("SHOW TABLES IN spark_catalog.default").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("gsc_t") && names.contains("gsc_plain"))

    spark.sql("DROP TABLE spark_catalog.default.gsc_t")
    spark.sql("DROP TABLE spark_catalog.default.gsc_plain")
  }

  test("OPTIONS-declared table properties are honored through the V1 path") {
    val loc = tmpTable() + "-gsc-opts"
    // OPTIONS (not TBLPROPERTIES): the V1 create records these under the
    // "option." property prefix — a primary-key declared here must still
    // materialize a PK table, not a silent plain append table
    spark.sql(
      s"""CREATE TABLE spark_catalog.default.gsc_opts (k BIGINT, v STRING) USING graft
         |OPTIONS ('primary-key' = 'k', 'bucket' = '2')
         |LOCATION '$loc'""".stripMargin)
    spark.sql("INSERT INTO spark_catalog.default.gsc_opts VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO spark_catalog.default.gsc_opts VALUES (1, 'a2')")
    val rows = spark.sql("SELECT k, v FROM spark_catalog.default.gsc_opts ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a2"), (2L, "b")), rows.mkString(","))
    val gt = graft.table.GraftTable.load(spark, loc)
    assert(gt.schema.primaryKeys == Seq("k"))
    assert(gt.schema.numBuckets == 2)
    spark.sql("DROP TABLE spark_catalog.default.gsc_opts")
  }
}
