package graft.table

import graft.GraftMeta._
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Row-level DELETE / UPDATE / MERGE INTO.
  *
  * Primary-key tables write change rows (+U / -D) — an O(changed rows) LSM
  * write (reference: UpdatePaimonTableCommand.scala:38, and the PK branch of
  * DeleteFromPaimonTableCommand.scala:45-177). Append tables use
  * copy-on-write: only the files that might contain matching rows are
  * rewritten, found by predicate pruning + an exact file-path pass
  * (reference: the COW branch of DeleteFromPaimonTableCommand).
  */
trait RowLevelOps { self: GraftTable =>

  /** DELETE FROM t WHERE cond. */
  def delete(cond: Column): Snapshot = {
    if (isPrimaryKeyed && schema.deletionVectors) {
      // dv mode: mark positions directly — no tombstone rows, no new data
      // files, one metadata commit (same machinery as the append-table DV
      // delete; live rows are unique per key so a position mask IS the
      // delete)
      deleteWithDvs(cond)
    } else if (isPrimaryKeyed) {
      val matching = toDF.filter(cond)
      upsert(matching, kinds = Some(lit(KindDelete)))
    } else {
      // fast path: predicate over partition columns only -> drop whole files,
      // no data rewrite (reference: partition drop fast-path in
      // DeleteFromPaimonTableCommand.scala:127)
      val refs = condRefs(cond)
      if (refs.nonEmpty && refs.forall(schema.partitionKeys.contains)) dropPartitions(cond)
      else if (schema.option("deletion-vectors.enabled", "false").toBoolean)
        deleteWithDvs(cond)
      else rewriteTouched(cond)(df => df.filter(!coalesce(cond, lit(false))))
    }
  }

  /** Deletion-vector DELETE: mark matching row positions in per-file
    * bitmaps instead of rewriting files — O(matched rows) metadata, no data
    * rewrite (reference: the DV branch of DeleteFromPaimonTableCommand
    * :127-137 + BitmapDeletionVector). Positions fold into RoaringBitmaps;
    * existing bitmaps union in.
    */
  private def deleteWithDvs(cond: Column): Snapshot = {
    require(schema.fileFormat == "parquet",
      "deletion vectors need the parquet row_index metadata column")
    val snapOpt = store.latestSnapshot
    if (snapOpt.isEmpty) return commitFiles(Nil, CommitKind.APPEND)
    val live = store.liveFiles(snapOpt.get)
    // rawUnion applies existing DVs, so already-deleted rows never re-match.
    // Positions fold into per-file RoaringBitmap blobs AND sidecars are
    // written ON THE EXECUTORS — the driver collects O(files) small
    // (path, dvPath, count) tuples, never bitmap bytes or matched rows.
    val hits = rawUnion(live, schema).filter(cond)
      .select(GraftTable.relDataPath.as("__f"),
        col("_metadata.row_index").cast("long").as("__i"))
      .groupBy("__f").agg(graft.functions.BitmapAgg.collect(col("__i")).as("__bm"))
    val entries = dvSidecarEntries(hits, live.map(f => f.path -> f).toMap)
    if (entries.isEmpty) return snapOpt.get
    // COMPACT kind: a DV rewrite reorganizes existing rows — input-producer
    // delta scans must not re-emit the re-ADDed file's survivors as +I
    commitFiles(entries, CommitKind.COMPACT)
  }

  /** UPDATE t SET assignments WHERE cond. Keys may be dotted paths
    * addressing struct members (`person.age`) — a nested assignment
    * rebuilds the root struct member-by-member, leaving unaddressed
    * members untouched (reference: row-level UPDATE supports nested
    * column assignment through MergeInto's updated-fields projection).
    */
  def update(cond: Column, rawAssignments: Map[String, Column]): Snapshot = {
    val assignments = RowLevelOps.foldNestedAssignments(schema, rawAssignments)
    val bad = assignments.keySet -- schema.fields.map(_.name).toSet
    require(bad.isEmpty, s"unknown columns: ${bad.mkString(",")}")
    require(!assignments.keySet.exists(schema.primaryKeys.contains),
      "cannot update primary key columns")
    if (isPrimaryKeyed) {
      val updated = toDF.filter(cond).withColumns(assignments)
      upsert(updated, kinds = Some(lit(KindUpdateAfter)))
    } else {
      val guarded = assignments.map { case (k, v) =>
        k -> when(coalesce(cond, lit(false)), v).otherwise(col(k))
      }
      rewriteTouched(cond)(df => df.withColumns(guarded))
    }
  }

  /** MERGE INTO builder; see [[MergeIntoBuilder]]. Conditions and assignment
    * expressions reference the source as `s.<col>` and target as `t.<col>`.
    */
  def mergeInto(source: DataFrame, on: Column): MergeIntoBuilder =
    new MergeIntoBuilder(this, source, on)

  // ---------------- append-table COW machinery ----------------

  /** Column names a predicate references, resolved against the table schema
    * (analysis-only, no job).
    */
  private def condRefs(cond: Column): Seq[String] = {
    val probe = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema.structType).filter(cond)
    org.apache.spark.sql.graft.SparkShims.analyzed(probe).collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.toSeq.map(_.name)
    }.flatten.distinct
  }

  /** Drop every file whose partition values satisfy cond (exact, driver-side
    * evaluation over the distinct partition values via a local frame).
    */
  private def dropPartitions(cond: Column): Snapshot = {
    val live = store.latestSnapshot.map(store.liveFiles).getOrElse(Nil)
    val matched = partitionsMatching(cond, live)
    commitFiles(
      live.filter(f => matched.contains(f.partition))
        .map(ManifestEntry(ManifestEntry.DELETE, _)),
      CommitKind.APPEND)
  }

  /** Distinct partition value tuples among `live` satisfying cond. The
    * original path-encoded strings ride along as a hidden column, so the
    * match maps back in O(matched) instead of a per-row linear re-encode
    * scan over every distinct partition.
    */
  def partitionsMatching(cond: Column, live: Seq[DataFileMeta]): Set[Seq[String]] = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val Sep = "\u0001" // never appears in partition-path-encoded values
    val ptFields = schema.partitionKeys.map(schema.fieldByName)
    val distinctVals = live.map(_.partition).distinct
    val rows = distinctVals.map { vs =>
      Row.fromSeq(vs.zip(ptFields).map { case (s, f) =>
        partitionValueToExternal(f.sparkType, s) } :+ vs.mkString(Sep))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(ptFields.map(_.toStructField) :+ StructField("__pt", StringType, false)))
    df.filter(cond).select("__pt").collect()
      .map(r => if (ptFields.isEmpty) Seq.empty[String]
                else r.getString(0).split(Sep, -1).toSeq)
      .toSet
  }

  private def partitionValueToExternal(dt: org.apache.spark.sql.types.DataType, s: String): Any = {
    import org.apache.spark.sql.types._
    if (s == PartitionPathUtils.NullPartitionValue) return null
    dt match {
      case StringType => s
      case IntegerType => s.toInt
      case LongType => s.toLong
      case ShortType => s.toShort
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case DateType => java.sql.Date.valueOf(s)
      case TimestampType => java.sql.Timestamp.valueOf(s)
      case TimestampNTZType => java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      case other => throw new IllegalArgumentException(s"partition type $other")
    }
  }

  /** Copy-on-write: rewrite only the files containing rows matching cond.
    * Candidate files are narrowed by manifest pruning (the filter pushes into
    * the FileIndex), then pinned exactly via `_metadata.file_path`.
    */
  private def rewriteTouched(cond: Column)(transform: DataFrame => DataFrame): Snapshot = {
    val snapOpt = store.latestSnapshot
    if (snapOpt.isEmpty) return commitFiles(Nil, CommitKind.APPEND)
    val live = store.liveFiles(snapOpt.get)
    val raw = rawUnion(live, schema)
    val touchedPaths = raw.filter(cond)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touchedPaths.isEmpty) return snapOpt.get
    // index the scanned paths by base name before matching — suffix-scanning
    // every touched path per live file is O(live × touched) driver string
    // work, ~10¹⁰ ops at 10⁵ files. Names are near-unique (job-UUID'd), so
    // each live file checks ~1 candidate; the endsWith keeps correctness if
    // two directories ever hold the same name.
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val byName = touchedPaths.groupBy(base)
    val touched = live.filter(f => byName.getOrElse(base(f.path), Set.empty)
      .exists(p => p.endsWith("/" + f.path)))
    val rewritten = transform(rawUnion(touched, schema))
      .select(schema.fields.map(f => col(f.name)): _*)
    val newFiles = stageWrite(rewritten, level = 0, seq = store.latestSnapshotId.getOrElse(0L) + 1)
    // COMPACT kind, like the DV path: a COW rewrite reorganizes existing
    // rows — delta scanners must not re-emit the survivors as new input
    commitFiles(
      touched.map(ManifestEntry(ManifestEntry.DELETE, _)) ++
        newFiles.map(ManifestEntry(ManifestEntry.ADD, _)),
      CommitKind.COMPACT)
  }
}

object RowLevelOps {
  /** Fold dotted assignment paths into whole-root-column struct rebuilds:
    * `person.age -> v` becomes `person -> struct(person.name, v AS age)`,
    * recursing for deeper paths. A null root struct stays null (its
    * members cannot be addressed).
    */
  private[table] def foldNestedAssignments(schema: graft.core.TableSchema,
      assignments: Map[String, Column]): Map[String, Column] =
    foldNestedAssignmentsWith(schema, assignments, col(_))

  /** As [[foldNestedAssignments]] but reading unaddressed members from a
    * caller-chosen source column (e.g. the aliased target side of a MERGE
    * join, `col("t.person")`).
    */
  private[table] def foldNestedAssignmentsWith(schema: graft.core.TableSchema,
      assignments: Map[String, Column], srcOf: String => Column): Map[String, Column] = {
    import org.apache.spark.sql.types.StructType
    val (nested, flat) = assignments.partition(_._1.contains('.'))
    if (nested.isEmpty) return assignments
    // assigning a whole struct AND one of its members in the same statement
    // is ambiguous (which wins?) — SQL engines reject it; so do we
    val conflicting = nested.keySet.map(_.split('.').head) & flat.keySet
    require(conflicting.isEmpty,
      s"conflicting assignments: ${conflicting.toSeq.sorted.mkString(",")} " +
        "assigned both as a whole and via nested member paths")
    val rebuilt = nested.groupBy(_._1.split('.').head).map { case (root, as) =>
      val f = schema.fields.find(_.name == root).getOrElse(
        throw new IllegalArgumentException(s"unknown columns: $root"))
      val st = f.sparkType match {
        case s: StructType => s
        case other => throw new IllegalArgumentException(
          s"$root is $other, not a struct — cannot assign ${as.keys.mkString(",")}")
      }
      val paths = as.map { case (k, v) => k.split('.').toList.tail -> v }
      def build(src: Column, t: StructType, ps: Map[List[String], Column]): Column =
        struct(t.fields.toSeq.map { c =>
          ps.get(List(c.name)) match {
            case Some(v) => v.cast(c.dataType).as(c.name)
            case None =>
              val deeper = ps.collect {
                case (h :: rest, v) if h == c.name && rest.nonEmpty => rest -> v
              }
              if (deeper.isEmpty) src.getField(c.name).as(c.name)
              else c.dataType match {
                case cst: StructType => build(src.getField(c.name), cst, deeper).as(c.name)
                case other => throw new IllegalArgumentException(
                  s"$root.${c.name} is $other, not a struct")
              }
          }
        }: _*)
      val unknown = paths.keys.filterNot(p => resolvable(st, p))
      require(unknown.isEmpty,
        s"unknown columns: ${unknown.map(p => (root :: p).mkString(".")).mkString(",")}")
      root -> when(srcOf(root).isNull, lit(null).cast(f.sparkType))
        .otherwise(build(srcOf(root), st, paths))
    }
    flat ++ rebuilt
  }

  private def resolvable(st: org.apache.spark.sql.types.StructType,
      path: List[String]): Boolean = path match {
    case Nil => false
    case h :: Nil => st.fieldNames.contains(h)
    case h :: rest => st.find(_.name == h).map(_.dataType).collect {
      case s: org.apache.spark.sql.types.StructType => resolvable(s, rest)
    }.getOrElse(false)
  }
}

/** MERGE INTO t USING s ON cond WHEN MATCHED ... WHEN NOT MATCHED ...
  * (reference: MergeIntoPaimonTable.scala:41-149 — constructChangedRows:83
  * joins source to target and tags each row with its action; we do the same
  * with one full-outer join and a when-chain, then a single LSM write of the
  * mixed +I/+U/-D rows.)
  *
  * Action order matters: the first matching clause wins, like SQL MERGE.
  * Supported on primary-key tables.
  */
class MergeIntoBuilder(table: GraftTable, source: DataFrame, on: Column) {
  private case class Clause(kind: String, cond: Option[Column],
      set: Map[String, Column])
  private var clauses = Vector.empty[Clause]
  private def tgtCols = table.schema.fields.map(_.name)

  def whenMatchedUpdate(set: Map[String, Column], cond: Option[Column] = None): this.type = {
    clauses :+= Clause("matched_update", cond, foldTargetNested(set)); this
  }
  // nested set keys (person.age) rebuild the TARGET side's struct
  private def foldTargetNested(set: Map[String, Column]): Map[String, Column] =
    RowLevelOps.foldNestedAssignmentsWith(table.schema, set, r => col(s"t.$r"))
  /** UPDATE SET * — every target column from the like-named source column. */
  def whenMatchedUpdateAll(cond: Option[Column] = None): this.type =
    whenMatchedUpdate(tgtCols.map(c => c -> col(s"s.$c")).toMap, cond)
  def whenMatchedDelete(cond: Option[Column] = None): this.type = {
    clauses :+= Clause("matched_delete", cond, Map.empty); this
  }
  def whenNotMatchedInsert(values: Map[String, Column], cond: Option[Column] = None): this.type = {
    clauses :+= Clause("not_matched_insert", cond, values); this
  }
  /** INSERT * — every target column from the like-named source column. */
  def whenNotMatchedInsertAll(cond: Option[Column] = None): this.type =
    whenNotMatchedInsert(tgtCols.map(c => c -> col(s"s.$c")).toMap, cond)
  def whenNotMatchedBySourceDelete(cond: Option[Column] = None): this.type = {
    clauses :+= Clause("nms_delete", cond, Map.empty); this
  }
  def whenNotMatchedBySourceUpdate(set: Map[String, Column], cond: Option[Column] = None): this.type = {
    clauses :+= Clause("nms_update", cond, foldTargetNested(set)); this
  }

  def execute(): graft.core.Snapshot = {
    require(table.isPrimaryKeyed, "MERGE INTO requires a primary-key table")
    require(clauses.nonEmpty, "MERGE INTO needs at least one WHEN clause")
    // presence markers robust to null join keys and null data columns
    val marked = source.withColumn("__s_mark", lit(1)).alias("s")
      .join(table.toDF.withColumn("__t_mark", lit(1)).alias("t"), on, "full_outer")
    val matchedC = col("__s_mark").isNotNull && col("__t_mark").isNotNull
    val srcOnly = col("__s_mark").isNotNull && col("__t_mark").isNull
    val tgtOnly = col("__s_mark").isNull && col("__t_mark").isNotNull

    def clauseGuard(c: Clause): Column = {
      val base = c.kind match {
        case k if k.startsWith("matched") => matchedC
        case k if k.startsWith("not_matched") => srcOnly
        case _ => tgtOnly
      }
      c.cond.map(base && _).getOrElse(base)
    }
    def kindOf(c: Clause): Byte = c.kind match {
      case "matched_update" | "nms_update" => KindUpdateAfter
      case "matched_delete" | "nms_delete" => KindDelete
      case _ => KindInsert
    }
    def defaultFor(c: Clause, name: String): Column =
      if (c.kind.startsWith("not_matched")) {
        if (source.columns.contains(name)) col(s"s.$name") else lit(null)
      } else col(s"t.$name")

    // first-match-wins when-chains, SQL MERGE clause semantics
    val kindExpr = clauses.reverse.foldLeft[Column](lit(null)) { (els, c) =>
      when(clauseGuard(c), lit(kindOf(c))).otherwise(els)
    }
    val outCols = tgtCols.map { name =>
      clauses.reverse.foldLeft[Column](lit(null)) { (els, c) =>
        when(clauseGuard(c), c.set.getOrElse(name, defaultFor(c, name))).otherwise(els)
      }.as(name)
    }
    val changes = marked
      .select(outCols :+ kindExpr.cast("byte").as("__kind"): _*)
      .filter(col("__kind").isNotNull)
    table.upsert(changes, kinds = Some(col("__kind")))
  }
}
