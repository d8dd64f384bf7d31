package graft

import java.nio.file.Files
import java.sql.DriverManager

/** JDBC-registry catalog over embedded Derby (reference:
  * paimon-core jdbc/JdbcCatalog.java): registry in SQL, data in the
  * warehouse, full DSv2 SQL surface inherited from GraftCatalog.
  */
class JdbcCatalogSpec extends SparkSpec {

  private lazy val base = Files.createTempDirectory("graft-jdbc-cat").toString
  private lazy val dbPath = s"$base/registry"
  private lazy val uri = s"jdbc:derby:$dbPath;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.stream.error.file", s"$base/derby.log")
    spark.conf.set("spark.sql.catalog.gj",
      classOf[graft.spark.v2.GraftJdbcCatalog].getName)
    spark.conf.set("spark.sql.catalog.gj.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.gj.uri", uri)
  }

  test("namespace + table CRUD, insert/select, rename, drop — registry in Derby") {
    spark.sql("CREATE NAMESPACE gj.db1")
    spark.sql(
      """CREATE TABLE gj.db1.t (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key'='k')""".stripMargin)
    spark.sql("INSERT INTO gj.db1.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gj.db1.t VALUES (2, 'b2')") // pk upsert
    val rows = spark.sql("SELECT k, v FROM gj.db1.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b2")))

    // the registry truly lives in Derby, not in directory listings
    val c = DriverManager.getConnection(uri)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT ns, tbl FROM graft_tables")
      assert(rs.next() && rs.getString(1) == "db1" && rs.getString(2) == "t")
      assert(!rs.next())
    } finally c.close()

    assert(spark.sql("SHOW TABLES IN gj.db1").collect().map(_.getString(1)).toSeq == Seq("t"))
    assert(spark.sql("SHOW NAMESPACES IN gj").collect().map(_.getString(0)).toSet
      == Set("db1", "default"))

    spark.sql("ALTER TABLE gj.db1.t ADD COLUMN extra DOUBLE")
    spark.sql("ALTER TABLE gj.db1.t RENAME TO db1.t2")
    assert(spark.sql("SELECT k FROM gj.db1.t2").count() == 2)
    assert(!spark.catalog.tableExists("gj.db1.t"))

    spark.sql("DROP TABLE gj.db1.t2")
    assert(spark.sql("SHOW TABLES IN gj.db1").count() == 0)
    spark.sql("DROP NAMESPACE gj.db1")
    assert(spark.sql("SHOW NAMESPACES IN gj").collect().map(_.getString(0)).toSeq
      == Seq("default"))
  }

  test("char/varchar (incl. nested) round-trip through the JDBC registry") {
    // the r16 FS-catalog regression was a nested ARRAY<VARCHAR(n)> raw
    // type resurrecting VarcharType at runtime — the JDBC registry path
    // serializes schemas separately, so it gets the same round-trip
    // asserts: declared lengths enforce on INSERT, nested arrays read
    // back as plain strings, and a reopened catalog sees the same types
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gj.dbcv")
    spark.sql(
      """CREATE TABLE gj.dbcv.cv (k INT, c CHAR(4), v VARCHAR(6),
        |a ARRAY<VARCHAR(5)>) USING graft""".stripMargin)
    spark.sql(
      "INSERT INTO gj.dbcv.cv VALUES (1, 'ab', 'hello', array('way-too-long', 'ok'))")
    val r = spark.sql("SELECT c, v, a FROM gj.dbcv.cv").collect()(0)
    assert(r.getString(0) == "ab  " && r.getString(1) == "hello")
    assert(r.getSeq[String](2) == Seq("way-too-long", "ok"))
    val e = intercept[Exception] {
      spark.sql(
        "INSERT INTO gj.dbcv.cv VALUES (2, 'ab', 'toolong7', array())")
    }
    assert(e.getMessage.toLowerCase.contains("length"), e.getMessage)
    // a FRESH catalog instance over the same registry re-reads the
    // serialized schema: types and enforcement must survive
    spark.conf.set("spark.sql.catalog.gjcv",
      classOf[graft.spark.v2.GraftJdbcCatalog].getName)
    spark.conf.set("spark.sql.catalog.gjcv.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.gjcv.uri", uri)
    val r2 = spark.sql("SELECT c, a FROM gjcv.dbcv.cv").collect()(0)
    assert(r2.getString(0) == "ab  " && r2.getSeq[String](1).size == 2)
    spark.sql(
      "INSERT INTO gjcv.dbcv.cv VALUES (3, 'cd', 'six', array('x'))")
    assert(spark.sql("SELECT count(*) FROM gjcv.dbcv.cv")
      .collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE gj.dbcv.cv")
  }

  test("a second catalog instance over the same registry sees the same tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gj.db2")
    spark.sql("CREATE TABLE gj.db2.s (id INT) USING graft")
    spark.sql("INSERT INTO gj.db2.s VALUES (7)")
    // fresh catalog name, same derby db + warehouse → same registry
    spark.conf.set("spark.sql.catalog.gj2",
      classOf[graft.spark.v2.GraftJdbcCatalog].getName)
    spark.conf.set("spark.sql.catalog.gj2.warehouse", s"$base/warehouse")
    spark.conf.set("spark.sql.catalog.gj2.uri", uri)
    assert(spark.sql("SELECT id FROM gj2.db2.s").collect().map(_.getInt(0)).toSeq == Seq(7))
    assert(spark.sql("SHOW TABLES IN gj2.db2").collect().map(_.getString(1)).toSeq == Seq("s"))
  }
}
