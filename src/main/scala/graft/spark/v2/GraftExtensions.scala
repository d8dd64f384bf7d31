package graft.spark.v2

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Session extensions: a tiny pre-parser for maintenance procedures
  * (reference: PaimonSparkSessionExtensions.scala:30-60 + the CALL grammar
  * PaimonSqlExtensions.g4:68-75 + CompactProcedure etc.). Everything that
  * is not `CALL <catalog>.sys.<proc>(...)` delegates to Spark's parser.
  *
  * Register with
  * `spark.sql.extensions=graft.spark.v2.GraftExtensions`. Examples:
  * {{{
  *   CALL graft.sys.compact('db.t')
  *   CALL graft.sys.expire_snapshots('db.t', 3)
  *   CALL graft.sys.create_tag('db.t', 'v1', 2)
  *   CALL graft.sys.create_branch('db.t', 'dev', 2)
  *   CALL graft.sys.fast_forward('db.t', 'dev')
  *   CALL graft.sys.rollback('db.t', 1)
  *   CALL graft.sys.zorder('db.t', 'a,b')
  *   CALL graft.sys.remove_orphan_files('db.t')
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // SQL UPDATE / MERGE INTO → row-level commands (reference: the analysis
    // rules PaimonUpdateTable.scala / PaimonMergeInto.scala)
    ext.injectPostHocResolutionRule(session => GraftRowLevelSqlRule(session))
    // incremental changelog as a table-valued function (reference:
    // extensions.injectTableFunction, PaimonSparkSessionExtensions.scala:51;
    // TableValuedFunctionsTest.scala:55):
    //   SELECT * FROM graft_incremental_query('<table path>', from, to)
    ext.injectTableFunction((
      FunctionIdentifier("graft_incremental_query"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "graft_incremental_query"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_incremental_query(table_path, from_snapshot_exclusive, to_snapshot)")
        def str(e: Expression): String = e.eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other.toString
        }
        val spark = SparkSession.active
        val table = GraftTable.load(spark, str(args(0)))
        // numeric bounds are snapshot ids; anything else resolves as a tag
        // name (reference: CoreOptions INCREMENTAL_BETWEEN accepts both,
        // CoreOptions.java:916)
        def bound(s: String): Long =
          if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
          else table.store.readTag(s).id
        val df = table.incremental(bound(str(args(1))), bound(str(args(2))))
        org.apache.spark.sql.graft.SparkShims.analyzed(df)
      }))
    // system tables as a table-valued function (reference exposes them as
    // `t$snapshots` suffix tables, table/system/SystemTableLoader.java; a
    // TVF keeps our distributed $files/$partitions plans intact):
    //   SELECT * FROM graft_system('<table path>', 'snapshots')
    ext.injectTableFunction((
      FunctionIdentifier("graft_system"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "graft_system"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_system(table_path, system_table_name)")
        def str(e: Expression): String = e.eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other.toString
        }
        val spark = SparkSession.active
        val name = str(args(1))
        // catalog-level system tables take the WAREHOUSE path instead of a
        // table path (reference: AllTableOptionsTable / CatalogOptionsTable)
        val df =
          if (graft.table.CatalogSystemTables.Names(name))
            graft.table.CatalogSystemTables(spark, str(args(0)), name)
          else GraftTable.load(spark, str(args(0))).system(name)
        org.apache.spark.sql.graft.SparkShims.analyzed(df)
      }))
    // ---- pipeline primitives for SQL-only users ----
    // Each builder returns the SAME Catalyst expression tree the Scala API
    // composes (codegen'd end to end, single source of truth) — which is
    // why these are session-extension functions rather than black-box V2
    // ScalarFunctions: a V2 function's produceResult cannot expand into a
    // composed expression tree, so it would be a second, row-at-a-time
    // implementation of the same math.
    def injectColumnFn(name: String, usage: String, minArgs: Int, maxArgs: Int)(
        build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name, usage),
        (args: Seq[Expression]) => {
          require(args.length >= minArgs && args.length <= maxArgs,
            s"$name: $usage")
          org.apache.spark.sql.graft.SparkShims.realExpr(
            build(args.map(org.apache.spark.sql.graft.SparkShims.column)))
        }))
    def intLit(e: org.apache.spark.sql.Column): Int = {
      val expr = org.apache.spark.sql.graft.SparkShims.realExpr(e)
      // eval(null) on a non-foldable arg (e.g. a column reference) throws
      // an unbound-attribute error from deep inside codegen — turn it into
      // a clear analysis-time message instead
      require(expr.foldable,
        s"parameter must be an integer literal, got: ${expr.sql}")
      expr.eval(null).asInstanceOf[Number].intValue
    }
    injectColumnFn("graft_shingles",
      "graft_shingles(text[, n]): distinct word n-gram shingles", 1, 2) { as =>
      graft.pipeline.Dedup.shingles(as.head,
        if (as.size > 1) intLit(as(1)) else 3)
    }
    injectColumnFn("graft_shingle_hashes",
      "graft_shingle_hashes(text): distinct 64-bit shingle hashes", 1, 1) { as =>
      graft.pipeline.Dedup.shingleHashes(as.head)
    }
    injectColumnFn("graft_minhash_sig",
      "graft_minhash_sig(text[, numHashes]): minhash signature array", 1, 2) { as =>
      graft.pipeline.Dedup.minhashSignature(
        graft.pipeline.Dedup.shingles(as.head),
        if (as.size > 1) intLit(as(1)) else 64)
    }
    injectColumnFn("graft_simhash",
      "graft_simhash(text): 64-bit simhash sketch", 1, 1) { as =>
      graft.pipeline.Dedup.simhashFromHashes(
        graft.pipeline.Dedup.tokenHashes(as.head))
    }
    injectColumnFn("graft_jaccard",
      "graft_jaccard(setA, setB): exact Jaccard similarity of two arrays", 2, 2) { as =>
      graft.pipeline.Dedup.jaccard(as.head, as(1))
    }
    injectColumnFn("graft_cosine",
      "graft_cosine(vecA, vecB): cosine similarity of two numeric arrays", 2, 2) { as =>
      graft.pipeline.VectorOps.cosine(as.head, as(1))
    }
    injectColumnFn("graft_hamming",
      "graft_hamming(a, b): Hamming distance of two 64-bit sketches", 2, 2) { as =>
      graft.pipeline.Dedup.hamming(as.head, as(1))
    }
    injectColumnFn("graft_chunks",
      "graft_chunks(text, size[, overlap]): fixed-size token windows with " +
        "overlap as array<string> — explode for one row per chunk", 2, 3) { as =>
      graft.pipeline.TextOps.chunkArray(as.head, intLit(as(1)),
        if (as.size > 2) intLit(as(2)) else 0)
    }
    // the vocab must be a LITERAL array (it is baked into the expression
    // tree as a map datum, exactly like the Scala API's Seq parameter)
    def strArrayLit(e: org.apache.spark.sql.Column): Seq[String] = {
      val expr = org.apache.spark.sql.graft.SparkShims.realExpr(e)
      val strArray = expr.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) => true
        // SQL `array()` types as ARRAY<VOID> — let it through as the
        // empty vocab so the callee's "empty vocab" require speaks,
        // instead of a misleading type error here
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.NullType, _) => true
        case _ => false
      }
      require(expr.foldable && strArray,
        s"parameter must be an array<string> literal, got: ${expr.sql}")
      val datum = expr.eval(null)
      require(datum != null, "vocab array literal must not be NULL")
      datum.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map { v =>
          require(v != null, "vocab pieces must not be null")
          v.toString
        }.toSeq
    }
    injectColumnFn("graft_bpe",
      "graft_bpe(text, merges_array): merges-list BPE tokens (GPT-style " +
        "lowest-rank pair fusion) over a LITERAL merges array of " +
        "'left right' pairs in priority order", 2, 2) { as =>
      val merges = strArrayLit(as(1)).map { m =>
        val parts = m.split(' ')
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"each merge must be 'left right' (one space): '$m'")
        (parts(0), parts(1))
      }
      graft.pipeline.TextOps.bpeTokens(as.head, merges)
    }
    injectColumnFn("graft_wordpiece",
      "graft_wordpiece(text, vocab_array[, unk]): greedy longest-match " +
        "WordPiece pieces (\"##\" continuations, whole-word unk on a dead " +
        "end) over a LITERAL vocab array", 2, 3) { as =>
      graft.pipeline.TextOps.wordpieceTokens(as.head, strArrayLit(as(1)),
        if (as.size > 2) {
          val u = org.apache.spark.sql.graft.SparkShims.realExpr(as(2))
          require(u.foldable && u.dataType ==
              org.apache.spark.sql.types.StringType,
            s"unk must be a string literal, got: ${u.sql}")
          val uv = u.eval(null)
          require(uv != null, "unk must not be NULL")
          uv.toString
        } else "[UNK]")
    }
  }
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val CallRe =
    """(?is)\s*CALL\s+(?:([A-Za-z0-9_]+)\s*\.)?\s*sys\s*\.\s*([A-Za-z0-9_]+)\s*\((.*)\)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CallRe(catalog, proc, args) =>
      CallProcedureCommand(Option(catalog), proc.toLowerCase,
        GraftSqlParser.splitArgs(args))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Split a CALL argument list on top-level commas; unquote literals. */
  def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote
      case ',' if !inQuote => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty || out.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }
}

/** Executes one maintenance procedure (reference: the Spark procedures in
  * paimon-spark/.../spark/procedure/).
  */
case class CallProcedureCommand(catalog: Option[String], proc: String,
    args: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // migrate_table adopts a PLAIN parquet directory — no graft table yet
    if (proc == "migrate_table") {
      require(args.size >= 2, "CALL sys.migrate_table(source_dir, target_path)")
      val t = graft.table.Migrate.parquetTable(spark, args(0), args(1))
      return Seq(Row(s"migrated ${args(0)} -> ${args(1)} " +
        s"(${t.store.latestSnapshot.map(_.totalRecordCount).getOrElse(0L)} rows in place)"))
    }
    // adopt a parquet directory's files into an EXISTING table (reference:
    // MigrateFileProcedure.java:42)
    if (proc == "migrate_file") {
      require(args.size >= 2, "CALL sys.migrate_file(source_dir, target_table)")
      val t = graft.table.Migrate.parquetFilesInto(spark, args(0),
        resolveTable(spark, args(1)))
      return Seq(Row(s"migrated files of ${args(0)} into ${args(1)} " +
        s"(now ${t.store.latestSnapshot.map(_.totalRecordCount).getOrElse(0L)} rows)"))
    }
    // privilege procedures act on the CALL's catalog, not a table
    // (reference: paimon-spark procedure/ privilege procedures +
    // paimon-core privilege/FileBasedPrivilegeManager.java)
    if (proc.contains("privilege") || proc.contains("privileged_user")) {
      val cat = spark.sessionState.catalogManager
        .catalog(catalog.getOrElse("graft")) match {
          case g: GraftCatalog => g
          case other => throw new IllegalArgumentException(
            s"privilege procedures need a graft catalog, got $other")
        }
      val p = cat.privileges
      val actor = cat.currentUser
      // verify the actor's password before any privilege mutation —
      // mutate() alone only checks the admin bit by user NAME
      cat.authenticateCurrentUser()
      val msg = proc match {
        case "init_file_based_privilege" =>
          p.initFileBased(args.headOption.getOrElse(
            throw new IllegalArgumentException("init_file_based_privilege(root_password)")))
          "privileges initialized; root user created"
        case "create_privileged_user" =>
          p.createUser(actor, args(0), args(1)); s"user ${args(0)} created"
        case "drop_privileged_user" =>
          p.dropUser(actor, args(0)); s"user ${args(0)} dropped"
        case "grant_privilege_to_user" =>
          val scope = if (args.size > 2) args(2) else "*"
          p.grant(actor, args(0), args(1).toUpperCase, scope)
          s"granted ${args(1)} on $scope to ${args(0)}"
        case "revoke_privilege_from_user" =>
          val scope = if (args.size > 2) args(2) else "*"
          p.revoke(actor, args(0), args(1).toUpperCase, scope)
          s"revoked ${args(1)} on $scope from ${args(0)}"
        case other => throw new IllegalArgumentException(s"unknown procedure: sys.$other")
      }
      return Seq(Row(msg))
    }
    val table = resolveTable(spark, args.headOption.getOrElse(
      throw new IllegalArgumentException(s"CALL sys.$proc: first arg must be the table")))
    val msg = proc match {
      case "compact" =>
        if (table.isPrimaryKeyed) { val s = table.compact(); s"compacted to snapshot ${s.id}" }
        else { val s = table.compactSmallFiles(); s"compacted to snapshot ${s.id}" }
      case "zorder" | "hilbert" | "sort_compact" =>
        val cols = args(1).split(",").map(_.trim).toSeq
        val strategy = if (proc == "sort_compact") "order" else proc
        val s = table.sortCompact(cols, strategy)
        s"clustered on ${cols.mkString(",")} at snapshot ${s.id}"
      case "expire_snapshots" =>
        // numeric arg: retain-last count; duration arg ("7d", "30m"): expire
        // by commit age (reference: ExpireSnapshotsProcedure's retain_max /
        // older_than pair)
        val expired =
          if (args(1).forall(_.isDigit)) table.expireSnapshots(args(1).toInt)
          else {
            val retainMin = if (args.size > 2) args(2).toInt else 1
            table.expireSnapshotsOlderThan(
              graft.table.Maintenance.parseDurationMillis(args(1)), retainMin)
          }
        s"expired ${expired.size} snapshots"
      case "expire_changelogs" =>
        // decoupled changelog retention (changelog.num-retained.min/max,
        // changelog.time-retained) applied on demand
        s"expired ${table.expireChangelogs().size} changelogs"
      case "create_tag" =>
        // snapshot id optional: default to the latest; 4th arg = TTL
        // duration (reference: CreateTagProcedure's optional snapshot /
        // time_retained parameters)
        val id = if (args.size > 2) args(2).toLong
          else table.store.latestSnapshotId.getOrElse(
            throw new IllegalArgumentException("table has no snapshots to tag"))
        val ttl = if (args.size > 3)
          Some(graft.core.TableSchema.parseDurationMillis(args(3))) else None
        table.store.createTag(args(1), id, ttl)
        s"tag ${args(1)} -> snapshot $id"
      case "expire_tags" =>
        s"expired tags: ${table.expireTags().mkString(",")}"
      case "delete_tag" => table.store.deleteTag(args(1)); s"deleted tag ${args(1)}"
      case "create_branch" =>
        table.createBranch(args(1), args(2).toLong); s"branch ${args(1)}"
      case "delete_branch" => table.store.deleteBranch(args(1)); s"deleted branch ${args(1)}"
      case "fast_forward" =>
        val s = table.fastForward(args(1)); s"fast-forwarded to snapshot ${s.id}"
      case "rollback" =>
        // snapshot id, or a tag name (reference: RollbackProcedure)
        val s =
          if (args(1).forall(_.isDigit)) table.rollbackTo(args(1).toLong)
          else table.rollbackToTag(args(1))
        s"rolled back at snapshot ${s.id}"
      case "remove_orphan_files" =>
        val older = if (args.size > 1) args(1).toLong else 24L * 3600 * 1000
        s"removed ${table.removeOrphanFiles(older).size} orphan files"
      case "expire_partitions" =>
        table.expirePartitions() match {
          case Some(s) => s"expired partitions at snapshot ${s.id}"
          case None => "no partitions expired"
        }
      // CALL sys.mark_partition_done('db.t' [, 'k1=v1,k2=v2', ...]) —
      // explicit partitions, or none → partitions idle past
      // partition.idle-time-to-done (reference: MarkPartitionDoneAction)
      case "mark_partition_done" =>
        val specs = args.drop(1).map { s =>
          val kv = s.split(',').map { seg =>
            val i = seg.indexOf('=')
            require(i > 0, s"bad partition spec: $seg (expected k=v)")
            seg.take(i).trim -> seg.drop(i + 1).trim
          }.toMap
          table.schema.partitionKeys.map(k => kv.getOrElse(k,
            throw new IllegalArgumentException(s"partition spec '$s' missing key $k")))
        }
        val marked = table.markPartitionsDone(specs)
        s"marked ${marked.size} partitions done: " +
          marked.take(5).map(_.mkString("/")).mkString(", ")
      case "repair" =>
        // consistency audit: every live manifest entry must point at an
        // existing file of the recorded size (reference procedure `repair`
        // re-syncs catalog metadata; filesystem-native graft validates it)
        val fs = table.store.fs
        val live = table.store.latestSnapshot.map(table.store.liveFiles).getOrElse(Nil)
        val problems = live.flatMap { f =>
          val p = new org.apache.hadoop.fs.Path(table.store.rootPath, f.path)
          if (!fs.exists(p)) Some(s"MISSING ${f.path}")
          else {
            val len = fs.getFileStatus(p).getLen
            if (len != f.size) Some(s"SIZE-MISMATCH ${f.path} ($len != ${f.size})")
            else None
          }
        }
        val dvProblems = live.flatMap(_.dvPath).filterNot(d =>
          fs.exists(new org.apache.hadoop.fs.Path(table.store.rootPath, d)))
          .map(d => s"MISSING-DV $d")
        val all = problems ++ dvProblems
        if (all.isEmpty) s"ok: ${live.size} live files verified"
        else throw new IllegalStateException(
          s"repair found ${all.size} problems: ${all.take(5).mkString("; ")}")
      case "rescale" =>
        val s = table.rescaleBucket(args(1).toInt)
        s"rescaled to ${args(1)} buckets at snapshot ${s.id}"
      case "rebuild_global_index" =>
        val s = table.rebuildGlobalIndex()
        s"rebuilt global pk index at snapshot ${s.id}"
      case "rebalance_index" =>
        // IVF hot-cell drift repair (the vector-layer analog of `rescale`):
        // re-salts cells whose live row counts have outgrown (or shrunk
        // below) the stored salt plan; optional 2nd arg overrides the
        // per-cell row ceiling
        val maxRows = if (args.size > 1) args(1).toLong else 0L
        val moved = graft.pipeline.VectorOps.rebalanceIndex(table, maxRows)
        if (moved.isEmpty) "rebalance_index: all cells within plan"
        else "rebalanced cells " + moved
          .map { case (c, o, n) => s"$c($o->$n salts)" }.mkString(", ")
      // CALL sys.retrain_ivf('db.ivf_index' [, iterations [, sampleFraction
      // [, reseed [, maxCellRows [, discardPending]]]]]) — centroid-drift
      // repair: Lloyd steps seeded from the stored centroids (or reseeded
      // from current content for heavy drift) over a sample of the index,
      // one atomic whole-table reassignment rewrite, options flip last
      // (crash-safe; re-running resumes from the pending centroids;
      // discardPending=true drops a stale pending stamp instead).
      // Single-writer: fails if the index commits mid-retrain.
      case "retrain_ivf" =>
        val iters = if (args.size > 1) args(1).toInt else 2
        val frac = if (args.size > 2) args(2).toDouble else 1.0
        val reseed = args.size > 3 && args(3).toBoolean
        val maxRows = if (args.size > 4) args(4).toLong else 0L
        val discard = args.size > 5 && args(5).toBoolean
        val (c, n) = graft.pipeline.VectorOps.retrainIvfIndex(
          table, iterations = iters, sampleFraction = frac,
          maxCellRows = maxRows, reseed = reseed, discardPending = discard)
        s"retrained $c centroids, rewrote $n rows"
      // CALL sys.rebuild_lsh_sidecar('db.ivf_index') — in-place sidecar
      // upgrade of a pre-sidecar IVF index (or family re-size)
      case "rebuild_lsh_sidecar" =>
        val (t, p) = graft.pipeline.VectorOps.rebuildLshSidecar(table)
        s"rebuilt lsh sidecar: $t tables x $p planes"
      // CALL sys.expire_from_indexes('db.corpus', 'doc_id', 'db.sig_index'
      // [, 'db.ivf_index' [, 'db.fp_index' [, 'db.span_index']]]) —
      // propagate corpus deletions (takedown/GDPR) into the dedup indexes
      case "expire_from_indexes" =>
        val (sigN, ivfN, fpN, spanN) =
          graft.streaming.StreamingDedup.expireFromIndexes(
            table, args(1), resolveTable(spark, args(2)),
            if (args.size > 3) Some(resolveTable(spark, args(3))) else None,
            if (args.size > 4) Some(resolveTable(spark, args(4))) else None,
            if (args.size > 5) Some(resolveTable(spark, args(5))) else None)
        s"expired $sigN sig-index, $ivfN ivf-index, $fpN fp-index and " +
          s"$spanN span-index entries"
      case "reset_consumer" =>
        val id = args(1)
        if (args.size > 2) {
          table.store.writeConsumer(id, args(2).toLong)
          s"consumer $id reset to next snapshot ${args(2)}"
        } else { table.store.deleteConsumer(id); s"consumer $id deleted" }
      case "analyze" =>
        val cols =
          if (args.size > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Nil
        val st = table.analyzeColumns(cols)
        s"analyzed ${st.cols.size} columns over ${st.rowCount} rows at snapshot ${st.snapshotId}"
      case other => throw new IllegalArgumentException(s"unknown procedure: sys.$other")
    }
    Seq(Row(msg))
  }

  /** Accept a filesystem path or a <catalog>.<ns>.<table> / <ns>.<table>
    * identifier against the CALL's catalog.
    */
  private def resolveTable(spark: SparkSession, ref: String): GraftTable = {
    if (ref.contains("/")) return GraftTable.load(spark, ref)
    val parts = ref.split("\\.").toSeq
    val (cat, ident) = (catalog, parts) match {
      case (Some(c), ns :+ t) => (c, Identifier.of(ns.toArray, t))
      case (None, c +: ns :+ t) if ns.nonEmpty => (c, Identifier.of(ns.toArray, t))
      case (None, ns :+ t) => ("graft", Identifier.of(ns.toArray, t))
      case _ => throw new IllegalArgumentException(s"cannot resolve table: $ref")
    }
    spark.sessionState.catalogManager.catalog(cat) match {
      case tc: TableCatalog => tc.loadTable(ident) match {
        case g: GraftSparkTable => g.table
        case other => throw new IllegalArgumentException(s"not a graft table: $other")
      }
      case other => throw new IllegalArgumentException(s"not a table catalog: $other")
    }
  }
}
