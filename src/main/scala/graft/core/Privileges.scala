package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

/** File-based access control (reference: paimon-core privilege/ —
  * `FileBasedPrivilegeManager.java`, `PrivilegedCatalog.java`,
  * `PrivilegeType.java`). All state is one JSON document under
  * `<warehouse>/.privilege/manager.json`: users with SHA-256 password
  * hashes and per-scope grants. Scopes nest — a grant on `*` (catalog)
  * covers every database, `db` covers every table in it, `db.table` one
  * table; `ADMIN` implies everything, and `root` is implicitly admin.
  *
  * Until `initFileBased(rootPassword)` creates the file, the manager is
  * DISABLED and every check passes — privilege-free catalogs stay
  * zero-config.
  */
object Privilege {
  val Select = "SELECT"
  val Insert = "INSERT"
  val AlterTable = "ALTER_TABLE"
  val DropTable = "DROP_TABLE"
  val CreateTable = "CREATE_TABLE"
  val CreateDatabase = "CREATE_DATABASE"
  val DropDatabase = "DROP_DATABASE"
  val Admin = "ADMIN"
  val All: Set[String] = Set(Select, Insert, AlterTable, DropTable,
    CreateTable, CreateDatabase, DropDatabase, Admin)

  def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}

class AccessDeniedException(msg: String) extends SecurityException(msg)

class PrivilegeManager(warehouse: Path, conf: Configuration) {
  import Privilege._

  private def fs = warehouse.getFileSystem(conf)
  private val file = new Path(new Path(warehouse, ".privilege"), "manager.json")

  /** user -> (passwordSha, scope -> privileges) */
  private type State = Map[String, (String, Map[String, Set[String]])]

  def enabled: Boolean = fs.exists(file)

  private def load(): State = {
    if (!enabled) return Map.empty
    val in = fs.open(file)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    Json.fields(Json.parse(txt).get("users")).map { case (user, n) =>
      user -> (n.get("password").asText(),
        Option(n.get("grants")).map(Json.fields(_).map { case (scope, ps) =>
          scope -> Json.elems(ps).map(_.asText()).toSet
        }.toMap).getOrElse(Map.empty))
    }.toMap
  }

  private def save(state: State): Unit = {
    val root = Json.obj()
    val users = root.putObject("users")
    state.toSeq.sortBy(_._1).foreach { case (user, (pw, grants)) =>
      val u = users.putObject(user)
      u.put("password", pw)
      val g = u.putObject("grants")
      grants.toSeq.sortBy(_._1).foreach { case (scope, ps) =>
        val a = g.putArray(scope)
        ps.toSeq.sorted.foreach(a.add)
      }
    }
    fs.mkdirs(file.getParent)
    val out = fs.create(file, true)
    try out.write(Json.write(root).getBytes("UTF-8")) finally out.close()
  }

  def initFileBased(rootPassword: String): Unit = {
    require(!enabled, "privileges already initialized")
    save(Map("root" -> (sha(rootPassword), Map.empty)))
  }

  def authenticate(user: String, password: String): Unit = {
    if (!enabled) return
    val st = load()
    st.get(user) match {
      case Some((pw, _)) if pw == sha(password) => ()
      case Some(_) => throw new AccessDeniedException(s"bad password for user $user")
      case None => throw new AccessDeniedException(s"unknown user $user")
    }
  }

  private def isAdmin(st: State, user: String): Boolean =
    user == "root" ||
      st.get(user).exists(_._2.values.exists(_.contains(Admin)))

  def createUser(actor: String, name: String, password: String): Unit = mutate(actor) { st =>
    require(!st.contains(name), s"user $name already exists")
    st + (name -> (sha(password), Map.empty))
  }

  def dropUser(actor: String, name: String): Unit = mutate(actor) { st =>
    require(name != "root", "cannot drop root")
    st - name
  }

  def grant(actor: String, user: String, priv: String, scope: String): Unit = {
    require(All.contains(priv), s"unknown privilege $priv (one of ${All.mkString(", ")})")
    mutate(actor) { st =>
      val (pw, grants) = st.getOrElse(user,
        throw new IllegalArgumentException(s"unknown user $user"))
      st + (user -> (pw, grants + (scope -> (grants.getOrElse(scope, Set.empty) + priv))))
    }
  }

  def revoke(actor: String, user: String, priv: String, scope: String): Unit =
    mutate(actor) { st =>
      val (pw, grants) = st.getOrElse(user,
        throw new IllegalArgumentException(s"unknown user $user"))
      val left = grants.getOrElse(scope, Set.empty) - priv
      st + (user -> (pw,
        if (left.isEmpty) grants - scope else grants + (scope -> left)))
    }

  private def mutate(actor: String)(f: State => State): Unit = {
    require(enabled, "privileges not initialized — CALL sys.init_file_based_privilege first")
    val st = load()
    if (!isAdmin(st, actor))
      throw new AccessDeniedException(s"$actor is not an admin")
    save(f(st))
  }

  /** Throw unless `user` holds `priv` at table, database, or catalog scope. */
  def check(user: String, priv: String, db: String, table: String = ""): Unit = {
    if (!enabled) return
    val st = load()
    if (isAdmin(st, user)) return
    val scopes = Seq("*", db) ++ (if (table.nonEmpty) Seq(s"$db.$table") else Nil)
    val grants = st.get(user).map(_._2).getOrElse(Map.empty)
    val ok = scopes.exists(s => grants.getOrElse(s, Set.empty).contains(priv))
    if (!ok) throw new AccessDeniedException(
      s"user $user lacks $priv on ${if (table.nonEmpty) s"$db.$table" else db}")
  }

  def listUsers(): Seq[String] = load().keys.toSeq.sorted
}
