package graft

import java.nio.file.Files
import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.HiveMetaStoreClient

/** HMS-registry catalog over an EMBEDDED Hive metastore (reference:
  * paimon-hive HiveCatalog.java + its embedded-metastore test setup):
  * databases and table identities in HMS, data at the warehouse layout,
  * full DSv2 SQL surface inherited from GraftCatalog.
  */
class HiveCatalogSpec extends SparkSpec {

  private lazy val base = Files.createTempDirectory("graft-hive-cat").toString
  private lazy val msDb = s"$base/metastore"

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.stream.error.file", s"$base/derby.log")
    spark.conf.set("spark.sql.catalog.gh",
      classOf[graft.spark.v2.GraftHiveCatalog].getName)
    spark.conf.set("spark.sql.catalog.gh.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.gh.metastore-db", msDb)
  }

  /** An independent HMS client over the same embedded metastore —
    * asserting the registry truly lives in HMS, not directory listings.
    */
  private def freshClient(): HiveMetaStoreClient = {
    val conf = new HiveConf()
    conf.setVar(HiveConf.ConfVars.METASTORECONNECTURLKEY,
      s"jdbc:derby:;databaseName=$msDb;create=true")
    conf.setBoolVar(HiveConf.ConfVars.METASTORE_SCHEMA_VERIFICATION, false)
    conf.setBoolVar(HiveConf.ConfVars.METASTORE_AUTO_CREATE_ALL, true)
    // the default pool (BoneCP) does not ship with Spark; DBCP does
    conf.setVar(HiveConf.ConfVars.METASTORE_CONNECTION_POOLING_TYPE, "DBCP")
    new HiveMetaStoreClient(conf)
  }

  test("namespace + table CRUD, insert/select, rename, drop — registry in HMS") {
    spark.sql("CREATE NAMESPACE gh.hdb")
    spark.sql(
      """CREATE TABLE gh.hdb.t (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key'='k')""".stripMargin)
    spark.sql("INSERT INTO gh.hdb.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gh.hdb.t VALUES (2, 'b2')") // pk upsert
    val rows = spark.sql("SELECT k, v FROM gh.hdb.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b2")))

    // the registry truly lives in the metastore
    val c = freshClient()
    try {
      assert(c.getAllDatabases.contains("hdb"))
      assert(c.getAllTables("hdb").contains("t"))
      val rec = c.getTable("hdb", "t")
      assert(rec.getParameters.get("provider") == "graft")
      assert(rec.getTableType == "EXTERNAL_TABLE")
      assert(rec.getSd.getLocation.endsWith("/warehouse/hdb/t"))
      // informational columns synced at create
      import scala.collection.JavaConverters._
      assert(rec.getSd.getCols.asScala.map(_.getName).toSeq == Seq("k", "v"))
    } finally c.close()

    assert(spark.sql("SHOW TABLES IN gh.hdb").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    assert(spark.sql("SHOW NAMESPACES IN gh").collect().map(_.getString(0)).toSet
      .contains("hdb"))

    // ALTER evolves the graft schema atomically AND re-syncs HMS columns
    spark.sql("ALTER TABLE gh.hdb.t ADD COLUMN extra DOUBLE")
    val c2 = freshClient()
    try {
      import scala.collection.JavaConverters._
      assert(c2.getTable("hdb", "t").getSd.getCols.asScala.map(_.getName).toSeq
        == Seq("k", "v", "extra"), "HMS columns re-synced after ALTER")
    } finally c2.close()

    spark.sql("ALTER TABLE gh.hdb.t RENAME TO hdb.t2")
    assert(spark.sql("SELECT k FROM gh.hdb.t2").count() == 2)
    assert(!spark.catalog.tableExists("gh.hdb.t"))

    spark.sql("DROP TABLE gh.hdb.t2")
    assert(spark.sql("SHOW TABLES IN gh.hdb").count() == 0)
    spark.sql("DROP NAMESPACE gh.hdb")
    assert(!spark.sql("SHOW NAMESPACES IN gh").collect().map(_.getString(0))
      .contains("hdb"))
  }

  test("char/varchar (incl. nested) round-trip through the HMS registry") {
    // HMS informational columns are a SEPARATE serialization of the
    // schema (FieldSchema type strings) from the graft schema file — the
    // r16 nested ARRAY<VARCHAR(n)> regression class. Declared lengths
    // must enforce on INSERT, nested arrays read back as plain strings,
    // and a fresh catalog instance over the metastore sees the same.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gh.hdbcv")
    spark.sql(
      """CREATE TABLE gh.hdbcv.cv (k INT, c CHAR(4), v VARCHAR(6),
        |a ARRAY<VARCHAR(5)>) USING graft""".stripMargin)
    spark.sql(
      "INSERT INTO gh.hdbcv.cv VALUES (1, 'ab', 'hello', array('way-too-long', 'ok'))")
    val r = spark.sql("SELECT c, v, a FROM gh.hdbcv.cv").collect()(0)
    assert(r.getString(0) == "ab  " && r.getString(1) == "hello")
    assert(r.getSeq[String](2) == Seq("way-too-long", "ok"))
    val e = intercept[Exception] {
      spark.sql(
        "INSERT INTO gh.hdbcv.cv VALUES (2, 'ab', 'toolong7', array())")
    }
    assert(e.getMessage.toLowerCase.contains("length"), e.getMessage)
    // fresh catalog instance: the schema read back through HMS must keep
    // working (no VarcharType resurrection at runtime)
    spark.conf.set("spark.sql.catalog.ghcv",
      classOf[graft.spark.v2.GraftHiveCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghcv.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.ghcv.metastore-db", msDb)
    val r2 = spark.sql("SELECT c, a FROM ghcv.hdbcv.cv").collect()(0)
    assert(r2.getString(0) == "ab  " && r2.getSeq[String](1).size == 2)
    spark.sql(
      "INSERT INTO ghcv.hdbcv.cv VALUES (3, 'cd', 'six', array('x'))")
    assert(spark.sql("SELECT count(*) FROM ghcv.hdbcv.cv")
      .collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE gh.hdbcv.cv")
  }

  test("a second catalog instance over the same metastore sees the same tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gh.hdb2")
    spark.sql("CREATE TABLE gh.hdb2.s (id INT) USING graft")
    spark.sql("INSERT INTO gh.hdb2.s VALUES (7)")
    spark.conf.set("spark.sql.catalog.gh2",
      classOf[graft.spark.v2.GraftHiveCatalog].getName)
    spark.conf.set("spark.sql.catalog.gh2.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.gh2.metastore-db", msDb)
    assert(spark.sql("SELECT id FROM gh2.hdb2.s").collect()
      .map(_.getInt(0)).toSeq == Seq(7))
    assert(spark.sql("SHOW TABLES IN gh2.hdb2").collect()
      .map(_.getString(1)).toSeq == Seq("s"))
  }
}
