package graft.spark.v2

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.sql.{Connection, DriverManager, SQLException}
import java.util
import scala.collection.JavaConverters._

/** JDBC-registry catalog (reference: paimon-core
  * org/apache/paimon/jdbc/JdbcCatalog.java — there the database/table
  * registry and a distributed lock live in any JDBC store while data stays
  * in the warehouse; same split here): namespaces and table pointers live
  * in two SQL tables, table DATA stays at the filesystem-catalog layout
  * `<warehouse>/<ns>/<table>`. Exercises the multi-catalog seam — the
  * engine-facing surface ([[GraftSparkTable]], scans, writes, time travel,
  * ALTER) is inherited unchanged from [[GraftCatalog]]; only the registry
  * primitives are overridden.
  *
  * {{{
  *   spark.sql.catalog.gj           = graft.spark.v2.GraftJdbcCatalog
  *   spark.sql.catalog.gj.warehouse = /data/warehouse
  *   spark.sql.catalog.gj.uri       = jdbc:derby:/data/catalog;create=true
  * }}}
  *
  * Tested against embedded Derby (ships with Spark); any JDBC database
  * with unique-key enforcement satisfies the contract — the PRIMARY KEYs
  * on the registry tables make concurrent CREATE resolve to exactly one
  * winner, mirroring the reference's insert-conflict handling.
  */
class GraftJdbcCatalog extends GraftCatalog {
  private var uri: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    super.initialize(name, options)
    uri = Option(options.get("uri")).getOrElse(throw new IllegalArgumentException(
      "GraftJdbcCatalog requires option 'uri', e.g. jdbc:derby:/path/db;create=true"))
    // Derby 10.16 registers via ServiceLoader; Class.forName keeps other
    // drivers that still rely on static-init registration working
    if (uri.startsWith("jdbc:derby:"))
      try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      catch { case _: ClassNotFoundException => () }
    withConn { c =>
      Seq(
        "CREATE TABLE graft_namespaces(ns VARCHAR(512) PRIMARY KEY)",
        """CREATE TABLE graft_tables(
          |  ns VARCHAR(512) NOT NULL, tbl VARCHAR(512) NOT NULL,
          |  location VARCHAR(4096) NOT NULL, PRIMARY KEY (ns, tbl))""".stripMargin
      ).foreach { ddl =>
        try { val st = c.createStatement(); try st.executeUpdate(ddl) finally st.close() }
        catch { case e: SQLException if e.getSQLState == "X0Y32" => () } // exists
      }
    }
  }

  private def withConn[T](f: Connection => T): T = {
    val c = DriverManager.getConnection(uri)
    try f(c) finally c.close()
  }

  private def nsKey(ns: Array[String]): String = ns.mkString(".")

  // ---------------- namespaces: registry = graft_namespaces ----------------

  override def listNamespaces(): Array[Array[String]] = {
    val rows = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT ns FROM graft_namespaces")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toArray
    }
    val all: Array[Array[String]] = rows.map(_.split('.'))
    if (all.exists(_.sameElements(Array("default")))) all else all :+ Array("default")
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default")) || withConn { c =>
      val ps = c.prepareStatement("SELECT 1 FROM graft_namespaces WHERE ns = ?")
      ps.setString(1, nsKey(namespace))
      try ps.executeQuery().next() finally ps.close()
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = privileges
    p.authenticate(user, password)
    p.check(user, graft.core.Privilege.CreateDatabase, nsKey(namespace))
    if (namespace.sameElements(Array("default"))) return
    val inserted = withConn { c =>
      val ps = c.prepareStatement("INSERT INTO graft_namespaces VALUES (?)")
      ps.setString(1, nsKey(namespace))
      try { ps.executeUpdate(); true }
      catch { case e: SQLException if isDuplicate(e) => false }
      finally ps.close()
    }
    if (!inserted) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = privileges
    p.authenticate(user, password)
    p.check(user, graft.core.Privilege.DropDatabase, nsKey(namespace))
    if (!namespaceExists(namespace)) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(s"namespace not empty: ${nsKey(namespace)}")
    withConn { c =>
      Seq("DELETE FROM graft_tables WHERE ns = ?",
        "DELETE FROM graft_namespaces WHERE ns = ?").foreach { sql =>
        val ps = c.prepareStatement(sql)
        ps.setString(1, nsKey(namespace))
        try ps.executeUpdate() finally ps.close()
      }
    }
    fs.delete(nsPath(namespace), true)
    true
  }

  // ---------------- tables: registry = graft_tables ----------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    withConn { c =>
      val ps = c.prepareStatement("SELECT tbl FROM graft_tables WHERE ns = ?")
      ps.setString(1, nsKey(namespace))
      val rs = ps.executeQuery()
      try Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1))
        .map(Identifier.of(namespace, _)).toArray
      finally ps.close()
    }
  }

  override def tableExists(ident: Identifier): Boolean = withConn { c =>
    val ps = c.prepareStatement("SELECT 1 FROM graft_tables WHERE ns = ? AND tbl = ?")
    ps.setString(1, nsKey(ident.namespace())); ps.setString(2, ident.name())
    try ps.executeQuery().next() finally ps.close()
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // super creates the data directory (its existence check routes through
    // the overridden tableExists); the registry row is the commit point —
    // the PRIMARY KEY makes exactly one concurrent creator win
    val t = super.createTable(ident, schema, partitions, properties)
    val inserted = withConn { c =>
      val ps = c.prepareStatement("INSERT INTO graft_tables VALUES (?, ?, ?)")
      ps.setString(1, nsKey(ident.namespace())); ps.setString(2, ident.name())
      ps.setString(3, tablePath(ident).toString)
      try { ps.executeUpdate(); true }
      catch { case e: SQLException if isDuplicate(e) => false }
      finally ps.close()
    }
    if (!inserted) throw new TableAlreadyExistsException(ident)
    t
  }

  override def dropTable(ident: Identifier): Boolean = {
    checked(graft.core.Privilege.DropTable, ident)
    if (!tableExists(ident)) return false
    withConn { c =>
      val ps = c.prepareStatement("DELETE FROM graft_tables WHERE ns = ? AND tbl = ?")
      ps.setString(1, nsKey(ident.namespace())); ps.setString(2, ident.name())
      try ps.executeUpdate() finally ps.close()
    }
    fs.delete(tablePath(ident), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    super.renameTable(oldIdent, newIdent) // moves the data dir, checks both ends
    withConn { c =>
      val ps = c.prepareStatement(
        "UPDATE graft_tables SET ns = ?, tbl = ?, location = ? WHERE ns = ? AND tbl = ?")
      ps.setString(1, nsKey(newIdent.namespace())); ps.setString(2, newIdent.name())
      ps.setString(3, tablePath(newIdent).toString)
      ps.setString(4, nsKey(oldIdent.namespace())); ps.setString(5, oldIdent.name())
      try ps.executeUpdate() finally ps.close()
    }
  }

  /** Derby: 23505 duplicate key; SQLState 23xxx is the standard
    * integrity-violation class across JDBC databases.
    */
  private def isDuplicate(e: SQLException): Boolean =
    Option(e.getSQLState).exists(_.startsWith("23"))
}
