package graft.spark.v2

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.HiveMetaStoreClient
import org.apache.hadoop.hive.metastore.api.{Database, FieldSchema, SerDeInfo, StorageDescriptor, Table => HmsTable}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.collection.JavaConverters._

/** Hive-Metastore-registry catalog (reference: paimon-hive
  * `HiveCatalog.java` — databases and table identities live in HMS, data
  * stays at the warehouse layout; most production Spark estates resolve
  * tables through HMS, so a lakehouse format must register there). Same
  * split as [[GraftJdbcCatalog]]: ONLY the registry primitives change —
  * scans, writes, time travel and ALTER are inherited from
  * [[GraftCatalog]], and each table's authoritative schema stays in its
  * own versioned `schema/` files (HMS columns are synced for
  * discoverability by external tools, exactly like the reference keeps
  * HMS fields in step with its own schema files).
  *
  * {{{
  *   spark.sql.catalog.gh           = graft.spark.v2.GraftHiveCatalog
  *   spark.sql.catalog.gh.warehouse = /data/warehouse
  *   // production: thrift metastore
  *   spark.sql.catalog.gh.uri       = thrift://hms-host:9083
  *   // tests / single node: embedded metastore (Derby-backed, like the
  *   // reference's HiveCatalogITCase setup)
  *   spark.sql.catalog.gh.metastore-db = /data/hms-db
  * }}}
  *
  * Tables register as EXTERNAL with `provider = graft` in the parameters
  * and the graft table location in the storage descriptor — engines that
  * do not understand graft see an opaque external table instead of
  * corrupting it (the reference stores a paimon storage-handler marker the
  * same way).
  */
class GraftHiveCatalog extends GraftCatalog {

  private var client: HiveMetaStoreClient = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    super.initialize(name, options)
    val conf = new HiveConf()
    Option(options.get("uri")) match {
      case Some(thrift) =>
        conf.setVar(HiveConf.ConfVars.METASTOREURIS, thrift)
      case None =>
        val db = Option(options.get("metastore-db")).getOrElse(
          throw new IllegalArgumentException("GraftHiveCatalog needs option " +
            "'uri' (thrift metastore) or 'metastore-db' (embedded metastore dir)"))
        // embedded metastore: in-process HMS over a local Derby database
        conf.setVar(HiveConf.ConfVars.METASTORECONNECTURLKEY,
          s"jdbc:derby:;databaseName=$db;create=true")
        conf.setBoolVar(HiveConf.ConfVars.METASTORE_SCHEMA_VERIFICATION, false)
        conf.setBoolVar(HiveConf.ConfVars.METASTORE_AUTO_CREATE_ALL, true)
        // the default pool (BoneCP) does not ship with Spark; DBCP does
        conf.setVar(HiveConf.ConfVars.METASTORE_CONNECTION_POOLING_TYPE, "DBCP")
    }
    conf.setVar(HiveConf.ConfVars.METASTOREWAREHOUSE, warehouse.toString)
    client = new HiveMetaStoreClient(conf)
  }

  /** HiveMetaStoreClient (a thrift client) is not thread-safe. */
  private def hms[T](f: HiveMetaStoreClient => T): T = synchronized(f(client))

  /** HMS namespaces are single-level databases. */
  private def db(ns: Array[String]): String = {
    require(ns.length == 1,
      s"hive metastore namespaces are single-level, got ${ns.mkString(".")}")
    ns.head
  }

  // ---------------- namespaces: registry = HMS databases ----------------

  override def listNamespaces(): Array[Array[String]] = {
    val all = hms(_.getAllDatabases).asScala.map(Array(_)).toArray
    if (all.exists(_.sameElements(Array("default")))) all else all :+ Array("default")
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default")) ||
      (namespace.length == 1 && hms(_.getAllDatabases).asScala.contains(namespace.head))

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = privileges
    p.authenticate(user, password)
    p.check(user, graft.core.Privilege.CreateDatabase, namespace.mkString("."))
    if (namespace.sameElements(Array("default"))) return
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    val d = new Database(db(namespace), "graft database",
      nsPath(namespace).toString, new util.HashMap[String, String]())
    hms(_.createDatabase(d))
    fs.mkdirs(nsPath(namespace))
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = privileges
    p.authenticate(user, password)
    p.check(user, graft.core.Privilege.DropDatabase, namespace.mkString("."))
    if (!namespaceExists(namespace)) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(s"namespace not empty: ${namespace.mkString(".")}")
    hms(_.dropDatabase(db(namespace), false, true, cascade))
    fs.delete(nsPath(namespace), true)
    true
  }

  // ---------------- tables: registry = HMS tables ----------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    if (namespace.sameElements(Array("default")) &&
        !hms(_.getAllDatabases).asScala.contains("default")) return Array.empty
    hms(_.getAllTables(db(namespace))).asScala
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      hms(_.tableExists(db(ident.namespace()), ident.name()))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    checkCreateTable(ident)
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace().toSeq)
    if (!hms(_.getAllDatabases).asScala.contains(db(ident.namespace())))
      hms(_.createDatabase(new Database(db(ident.namespace()), "graft database",
        nsPath(ident.namespace()).toString, new util.HashMap[String, String]())))
    // HMS record FIRST — it is the atomic duplicate check for (db, name).
    // Creating the data dir before registering let a losing racer leave
    // (or overwrite) schema files at the winner's tablePath. Crash-window
    // trade-off (documented): a process dying BETWEEN the HMS register
    // and doCreateTable leaves a registered name with no schema files —
    // visible as a loadTable failure until `DROP TABLE` clears it. The
    // files-first order's crash window instead leaves invisible orphan
    // schema files that a later create at the same path trips over with
    // no name to drop; a visible, droppable name is the recoverable half.
    try hms(_.createTable(hmsRecord(ident, schema)))
    catch {
      case _: org.apache.hadoop.hive.metastore.api.AlreadyExistsException =>
        throw new TableAlreadyExistsException(ident)
    }
    try doCreateTable(ident, schema, partitions, properties)
    catch {
      case e: Throwable =>
        // don't leave a registered name with no table behind it
        try hms(_.dropTable(db(ident.namespace()), ident.name(), false, true))
        catch { case _: Exception => () }
        throw e
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    checked(graft.core.Privilege.DropTable, ident)
    if (!tableExists(ident)) return false
    hms(_.dropTable(db(ident.namespace()), ident.name(), false, true))
    fs.delete(tablePath(ident), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    super.renameTable(oldIdent, newIdent) // moves the data dir, checks both ends
    val rec = hms(_.getTable(db(oldIdent.namespace()), oldIdent.name()))
    rec.setDbName(db(newIdent.namespace()))
    rec.setTableName(newIdent.name())
    rec.getSd.setLocation(tablePath(newIdent).toString)
    hms(_.alter_table(db(oldIdent.namespace()), oldIdent.name(), rec))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = super.alterTable(ident, changes: _*) // one atomic schema commit
    // re-sync the informational HMS columns with the evolved graft schema
    val rec = hms(_.getTable(db(ident.namespace()), ident.name()))
    rec.getSd.setCols(
      graft.table.GraftTable.load(spark, tablePath(ident).toString).schema.fields
        .map(f => new FieldSchema(f.name, f.sparkType.catalogString, ""))
        .toList.asJava)
    hms(_.alter_table(db(ident.namespace()), ident.name(), rec))
    t
  }

  /** Spark type → informational Hive column DDL (authoritative types live
    * in the graft schema files; HMS columns exist so `SHOW TABLES` /
    * BI-tool metadata browsing works, like the reference's field sync).
    */
  private def hmsCols(schema: StructType): util.List[FieldSchema] =
    schema.fields.map(f =>
      new FieldSchema(f.name, f.dataType.catalogString, "")).toList.asJava

  private def hmsRecord(ident: Identifier, schema: StructType): HmsTable = {
    val sd = new StorageDescriptor()
    sd.setCols(hmsCols(schema))
    sd.setLocation(tablePath(ident).toString)
    sd.setInputFormat("org.apache.hadoop.mapred.TextInputFormat")
    sd.setOutputFormat("org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat")
    sd.setSerdeInfo(new SerDeInfo(ident.name(),
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe",
      new util.HashMap[String, String]()))
    val t = new HmsTable()
    t.setDbName(db(ident.namespace()))
    t.setTableName(ident.name())
    t.setSd(sd)
    t.setTableType("EXTERNAL_TABLE")
    // a REAL mutable map: HMS mutates table parameters in place
    // (populateQuickStats) and chokes on immutable wrappers
    val params = new util.HashMap[String, String]()
    params.put("provider", "graft"); params.put("EXTERNAL", "TRUE")
    t.setParameters(params)
    t
  }
}
