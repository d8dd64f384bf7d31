package graft

/** DSv2-native row-level operations (SupportsRowLevelOperations +
  * SupportsDelta) behind the 'rowlevel.v2' table option: Spark's own
  * rewrites must plan UPDATE/MERGE (WriteDelta), the results must be
  * byte-identical to the analysis-rule path, and the flag must be a
  * per-table choice (unflagged tables keep the command path).
  */
class DeltaProtocolSpec extends SparkSpec {

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_dp", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dp.db")
  }

  private var n = 0
  private def freshName(): String = { n += 1; s"dp_$n" }

  private def mkTable(flag: Boolean): String = {
    val name = freshName()
    val props = if (flag) ", 'rowlevel.v2' = 'true'" else ""
    spark.sql(
      s"""CREATE TABLE graft_dp.db.$name (k BIGINT, status STRING, price DOUBLE)
         |USING graft TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2'$props)""".stripMargin)
    spark.sql(s"INSERT INTO graft_dp.db.$name VALUES " +
      "(1, 'O', 10.0), (2, 'F', 20.0), (3, 'O', 30.0), (4, 'F', 40.0)")
    name
  }

  private def dml(name: String): Unit = {
    spark.sql(s"UPDATE graft_dp.db.$name SET price = price * 2 WHERE status = 'O'")
    spark.sql("SELECT * FROM VALUES (CAST(2 AS BIGINT), 'X', 0.0), " +
      "(CAST(9 AS BIGINT), 'N', 90.0) AS v(k, status, price)")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(
      s"""MERGE INTO graft_dp.db.$name t USING ${name}_src s ON t.k = s.k
         |WHEN MATCHED AND s.status = 'X' THEN UPDATE SET status = s.status, price = s.price
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(s"DELETE FROM graft_dp.db.$name WHERE price >= 80.0")
  }

  private def snap(name: String): Seq[(Long, String, Double)] =
    spark.sql(s"SELECT k, status, price FROM graft_dp.db.$name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("delta protocol results match the analysis-rule path exactly") {
    val flagged = mkTable(flag = true)
    val plain = mkTable(flag = false)
    dml(flagged); dml(plain)
    val (a, b) = (snap(flagged), snap(plain))
    assert(a == b, s"delta=$a command=$b")
    // sanity on the actual content: 1 doubled (O), 2 overwritten by MERGE,
    // 9 inserted then deleted with 4x-priced rows (>=80): 9@90 deleted
    assert(a == Seq((1L, "O", 20.0), (2L, "X", 0.0), (3L, "O", 60.0), (4L, "F", 40.0)), a.toString)
  }

  test("subquery DELETE: WriteDelta on flagged tables, a clear error on plain ones") {
    // not expressible as pushed filters — the filter-delete path never
    // supported it; the delta protocol plans it as a WriteDelta join,
    // which is a real capability the flag ADDS
    val flagged = mkTable(flag = true)
    spark.sql(s"DELETE FROM graft_dp.db.$flagged WHERE k IN " +
      s"(SELECT k FROM graft_dp.db.$flagged WHERE price >= 30.0)")
    assert(snap(flagged).map(_._1) == Seq(1L, 2L), snap(flagged).toString)

    val plain = mkTable(flag = false)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"DELETE FROM graft_dp.db.$plain WHERE k IN " +
        s"(SELECT k FROM graft_dp.db.$plain WHERE price >= 30.0)")
    }
    assert(e.getMessage.toLowerCase.contains("subquery"), e.getMessage)
  }

  test("flagged table plans UPDATE/MERGE through WriteDelta, unflagged through commands") {
    val flagged = mkTable(flag = true)
    val plain = mkTable(flag = false)
    def planOf(sql: String): String =
      spark.sessionState.executePlan(spark.sessionState.sqlParser.parsePlan(sql))
        .analyzed.toString
    val up = s"UPDATE graft_dp.db.%s SET price = 0.0 WHERE status = 'O'"
    val pf = planOf(up.format(flagged))
    assert(pf.contains("WriteDelta"), s"expected WriteDelta in:\n$pf")
    val pp = planOf(up.format(plain))
    assert(pp.contains("GraftUpdateCommand"), s"expected GraftUpdateCommand in:\n$pp")
  }

  test("delta deletes succeed on tables with NOT NULL non-pk columns") {
    // delete() stages key-only rows (non-key values null); the staged schema
    // must relax NOT NULL on non-pk fields or the parquet writer throws on
    // the unset REQUIRED field
    val name = freshName()
    spark.sql(
      s"""CREATE TABLE graft_dp.db.$name
         |(k BIGINT, status STRING NOT NULL, price DOUBLE NOT NULL)
         |USING graft TBLPROPERTIES
         |('primary-key' = 'k', 'bucket' = '2', 'rowlevel.v2' = 'true')""".stripMargin)
    spark.sql(s"INSERT INTO graft_dp.db.$name VALUES " +
      "(1, 'O', 10.0), (2, 'F', 20.0), (3, 'O', 30.0)")
    // subquery DELETE cannot fall back to the metadata path — it must stage
    // delete rows through the delta writer
    spark.sql(s"DELETE FROM graft_dp.db.$name WHERE k IN " +
      s"(SELECT k FROM graft_dp.db.$name WHERE price >= 20.0)")
    assert(snap(name) == Seq((1L, "O", 10.0)), snap(name).toString)
    // MERGE delete action takes the same staged-row path
    spark.sql("SELECT CAST(1 AS BIGINT) AS k").createOrReplaceTempView(s"${name}_del")
    spark.sql(
      s"""MERGE INTO graft_dp.db.$name t USING ${name}_del s ON t.k = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(snap(name).isEmpty, snap(name).toString)
  }

  test("deletes with pushable predicates still take the metadata path on flagged tables") {
    val flagged = mkTable(flag = true)
    // a plain predicate DELETE must NOT rewrite to WriteDelta (Spark's
    // OptimizeMetadataOnlyDeleteFromTable converts it back because
    // canDeleteWhere accepts the filters) — cheap deletes stay cheap
    spark.sql(s"DELETE FROM graft_dp.db.$flagged WHERE k = 4")
    assert(snap(flagged).map(_._1) == Seq(1L, 2L, 3L))
  }
}
