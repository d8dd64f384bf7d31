package graft

import graft.core.AccessDeniedException
import org.apache.spark.sql.functions._

/** File-based access control through the DSv2 catalog (reference:
  * paimon-core privilege/ + PrivilegedCatalog): init, users, grants at
  * table/database/catalog scope, enforcement on scan/write/DDL.
  */
class PrivilegeSpec extends SparkSpec {

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-priv-wh").toString

  private def reg(cat: String, user: String = null, password: String = null): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    if (user != null) spark.conf.set(s"spark.sql.catalog.$cat.user", user)
    if (password != null) spark.conf.set(s"spark.sql.catalog.$cat.password", password)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    reg("privroot", "root", "rootpw")
    reg("privalice", "alice", "alicepw")
    reg("privanon")
  }

  private def denied(f: => Any): Unit =
    try { f; fail("expected AccessDeniedException") } catch {
      case _: AccessDeniedException => ()
      case e: Exception if causeChain(e).exists(_.isInstanceOf[AccessDeniedException]) => ()
    }
  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("init, users, grants: full lifecycle with enforcement") {
    // before init: anonymous can do everything
    spark.sql("CREATE NAMESPACE IF NOT EXISTS privanon.pdb")
    spark.sql("CREATE TABLE privanon.pdb.t0 (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO privanon.pdb.t0 VALUES (1, 'a')")

    spark.sql("CALL privanon.sys.init_file_based_privilege('rootpw')")

    // after init: anonymous is rejected at authentication
    denied(spark.sql("SELECT * FROM privanon.pdb.t0").collect())

    // root sees everything, creates alice with SELECT on one table
    assert(spark.sql("SELECT * FROM privroot.pdb.t0").count() == 1)
    spark.sql("CALL privroot.sys.create_privileged_user('alice', 'alicepw')")
    spark.sql("CALL privroot.sys.grant_privilege_to_user('alice', 'SELECT', 'pdb.t0')")

    assert(spark.sql("SELECT * FROM privalice.pdb.t0").count() == 1)
    // no INSERT grant
    denied(spark.sql("INSERT INTO privalice.pdb.t0 VALUES (2, 'b')"))
    // no DDL grants
    denied(spark.sql("DROP TABLE privalice.pdb.t0"))
    denied(spark.sql("CREATE TABLE privalice.pdb.t1 (id BIGINT) USING graft"))
    // non-admin cannot grant
    denied(spark.sql(
      "CALL privalice.sys.grant_privilege_to_user('alice', 'INSERT', 'pdb.t0')"))

    // database-scope INSERT covers the table
    spark.sql("CALL privroot.sys.grant_privilege_to_user('alice', 'INSERT', 'pdb')")
    spark.sql("INSERT INTO privalice.pdb.t0 VALUES (2, 'b')")
    assert(spark.sql("SELECT * FROM privalice.pdb.t0").count() == 2)

    // revoke closes the door again
    spark.sql("CALL privroot.sys.revoke_privilege_from_user('alice', 'INSERT', 'pdb')")
    denied(spark.sql("INSERT INTO privalice.pdb.t0 VALUES (3, 'c')"))

    // catalog-scope CREATE_TABLE
    spark.sql("CALL privroot.sys.grant_privilege_to_user('alice', 'CREATE_TABLE', '*')")
    spark.sql("CREATE TABLE privalice.pdb.t2 (id BIGINT) USING graft")

    // bad password never authenticates
    reg("privmallory", "alice", "wrong")
    denied(spark.sql("SELECT * FROM privmallory.pdb.t0").collect())

    // privilege procedures authenticate too: claiming user=root with the
    // wrong password must not be able to administer users or grants
    reg("privfakeroot", "root", "wrong")
    denied(spark.sql("CALL privfakeroot.sys.create_privileged_user('eve', 'evepw')"))
    denied(spark.sql(
      "CALL privfakeroot.sys.grant_privilege_to_user('alice', 'ADMIN', '*')"))

    // drop user
    spark.sql("CALL privroot.sys.drop_privileged_user('alice')")
    denied(spark.sql("SELECT * FROM privalice.pdb.t0").collect())
  }
}
