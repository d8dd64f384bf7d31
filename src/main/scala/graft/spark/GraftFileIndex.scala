package graft.spark

import graft.GraftMeta
import graft.core._
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, Murmur3Hash, XxHash64}
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, FileIndex, PartitionDirectory}
import org.apache.spark.sql.sources.{And => SAnd, EqualTo => SEqualTo, Filter, In => SIn}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan planner: maps a snapshot's manifest entries to Spark's file-source
  * scan, pruning at three levels before any executor touches a file
  * (reference: paimon-core AbstractFileStoreScan.doPlan:287):
  *
  *  1. partition pruning — exact evaluation of partition filters against the
  *     partition values recorded per file (reference:
  *     SnapshotReaderImpl.withFilter:158-178);
  *  2. bucket pruning — primary-key equality hashes to a single bucket
  *     (reference: ScanBucketFilter / SnapshotReaderImpl.withBucketFilter:213);
  *  3. stats skipping — per-file min/max/nullCount evaluation
  *     (reference: KeyValueFileStoreScan.filterByStats:103).
  *
  * Catalyst calls `listFiles` with the pushed partition + data filters, so
  * every read through this index — library API or `format("graft")` — gets
  * pruning and Spark's vectorized parquet reader (row-group pruning included)
  * with no custom reader code. This is the integration style proven at
  * 100 TB+ scale by open lakehouse formats on Spark.
  */
class GraftFileIndex(
    spark: SparkSession,
    store: FileStore,
    schema: TableSchema,
    source: Either[Snapshot, Seq[DataFileMeta]],
    val partitionSchema: StructType) extends FileIndex {

  /** Compatibility constructor over an explicit file list. */
  def this(spark: SparkSession, store: FileStore, schema: TableSchema,
      files: Seq[DataFileMeta], partitionSchema: StructType) =
    this(spark, store, schema, Right(files), partitionSchema)

  private val dataDirStr = store.dataDir.toString
  private val typeByName: Map[String, DataType] =
    schema.fields.map(f => f.name -> f.sparkType).toMap
  private val typeOf: String => Option[DataType] = typeByName.get

  private lazy val allFiles: Seq[DataFileMeta] = source match {
    case Right(fs) => fs
    case Left(snap) => store.liveFiles(snap)
  }

  override def rootPaths: Seq[Path] = Seq(store.dataDir)

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] =
    allFiles.map(f => new Path(store.rootPath, f.path).toString).toArray

  override def sizeInBytes: Long = source match {
    // metadata-only estimate: no manifest shard is read just for CBO sizing
    case Left(snap) if snap.manifestMeta.nonEmpty =>
      math.max(snap.manifestMeta.map(_.dataSize).sum, 1L)
    case _ => math.max(allFiles.map(_.size).sum, 1L)
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val partPreds = translate(partitionFilters)
    val dataPreds = translate(dataFilters)
    val bucketKeep = GraftFileIndex.bucketPruner(store, schema, dataPreds)
    // dynamic-bucket point lookups prune through the durable hash index
    val dynKeep: DataFileMeta => Boolean = source match {
      case Left(snap) =>
        GraftFileIndex.dynamicBuckets(spark, store, schema, snap.indexFiles, dataPreds)
          .map(bs => (f: DataFileMeta) => bs.contains(f.bucket))
          .getOrElse(_ => true)
      case _ => _ => true
    }
    // cross-partition point lookups prune to the key's indexed partitions
    val xpKeep: DataFileMeta => Boolean = source match {
      case Left(snap) =>
        GraftFileIndex.crossPartitionGroups(spark, store, schema,
            snap.indexFiles, dataPreds)
          .map(gs => (f: DataFileMeta) =>
            gs.contains((graft.table.GraftTable.encodePartition(f.partition), f.bucket)))
          .getOrElse(_ => true)
      case _ => _ => true
    }

    // manifest-shard skipping: folded shards whose recorded partition
    // range OR column-stat ranges can't match are never parsed. Stats
    // shard tests reuse the compiled per-file evaluator over the shard's
    // folded ColStats (min of mins / max of maxes / summed nulls) — a
    // key-range plan at 10⁷ files read every shard (60+ s of manifest
    // parse) before shard-level colStats existed.
    val candidates = source match {
      case Left(snap) if partPreds.nonEmpty || dataPreds.nonEmpty =>
        val shardStats = dataPreds.map(p => Pruning.compileMight(p, typeOf))
        store.liveFiles(snap, meta => {
          val partOk = (meta.ptMin, meta.ptMax) match {
            case (Some(lo), Some(hi)) =>
              partPreds.forall(p => Pruning.shardMightMatch(p, schema.partitionKeys, lo, hi))
            case _ => true
          }
          partOk && (meta.colStats.isEmpty ||
            shardStats.forall(_(meta.colStats, meta.rowCount)))
        })
      case _ => allFiles
    }

    // predicate evaluation is compiled/memoized ONCE per plan: partition
    // predicates run per DISTINCT partition tuple, stats predicates have
    // types + literals pre-resolved — per-file interpretation measured
    // 13.7 s (pruned) / 8.5 s (stats) on a 1M-file plan
    val partKeep = Pruning.partitionKeep(partPreds, partitionValueNames, typeOf)
    val statsKeep: DataFileMeta => Boolean =
      if (dataPreds.isEmpty) _ => true
      else {
        val compiled = dataPreds.map(p => Pruning.compileMight(p, typeOf))
        f => compiled.forall(_(f.stats, f.rowCount))
      }
    val selected = candidates.filter { f =>
      partKeep(partitionOf(f)) &&
      bucketKeep(f) && dynKeep(f) && xpKeep(f) && statsKeep(f) &&
      GraftFileIndex.bloomMightMatch(store, schema, f, dataPreds)
    }

    selected.groupBy(f => (f.partition, f.bucket)).toSeq.map { case ((pv, bucket), fs) =>
      PartitionDirectory(partitionInternalRow(pv, bucket), fs.map(toFileStatus).toArray)
    }
  }

  /** Names of the partition-path columns in order (incl. synthetic bucket). */
  private def partitionValueNames: Seq[String] =
    if (schema.hasBucketDirs) schema.partitionKeys :+ GraftMeta.BucketCol
    else schema.partitionKeys

  private def partitionOf(f: DataFileMeta): Seq[String] =
    if (schema.hasBucketDirs) f.partition :+ f.bucket.toString else f.partition

  private def translate(exprs: Seq[Expression]): Seq[Filter] =
    exprs.flatMap(e => org.apache.spark.sql.graft.SparkShims.translateFilter(e))

  private def toFileStatus(f: DataFileMeta): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L,
      new Path(store.rootPath, f.path))

  private def partitionInternalRow(values: Seq[String], bucket: Int): InternalRow = {
    val all: Seq[Any] = partitionSchema.fields.toSeq.zipWithIndex.map { case (sf, i) =>
      if (sf.name == GraftMeta.BucketCol) bucket
      else GraftFileIndex.partitionValueToInternal(sf.dataType, values(i))
    }
    new GenericInternalRow(all.toArray)
  }
}

object GraftFileIndex {

  /** Bloom-index file skipping: an equality on an indexed column whose
    * literal is definitely absent from the file's bloom prunes the file
    * (reference: FileIndexPredicate.testPredicate:49,70). Conservative:
    * only top-level AND-ed equalities consult the index.
    */
  def bloomMightMatch(store: FileStore, schema: TableSchema,
      f: DataFileMeta, filters: Seq[Filter]): Boolean = {
    if (f.blooms.isEmpty) return true
    def eqs(fl: Filter): Seq[(String, Any)] = fl match {
      case SEqualTo(c, v) if v != null => Seq(c -> v)
      case SAnd(l, r) => eqs(l) ++ eqs(r)
      case _ => Nil
    }
    filters.flatMap(eqs).forall { case (c, v) =>
      (f.blooms.get(c), schema.fields.find(_.name == c)) match {
        case (Some(p), Some(field)) =>
          store.readBloom(p).mightContainLong(
            org.apache.spark.sql.graft.SparkShims.xxhash64Literal(field.sparkType, v))
        case _ => true
      }
    }
  }

  /** Primary-key point lookups prune to one bucket: if the filters pin every
    * primary-key column with an equality, hash the literals exactly like the
    * write path does (Murmur3, seed 42 — Spark's functions.hash).
    */
  def bucketFromFilters(schema: TableSchema, filters: Seq[Filter]): Option[Int] =
    bucketsFromFilters(schema, filters).collect { case s if s.size == 1 => s.head }

  /** Per-file bucket-prune predicate that is safe across bucket-rescale
    * history: each file's bucket id is checked against literals hashed with
    * the bucket count of the schema the file was WRITTEN under (files carry
    * their schemaId), never blindly with the current count. A scan that
    * observes a table mid-rescale — the bucket option already flipped but
    * the rewrite not yet committed, or a rescale that failed between its
    * two commits — must not prune old-layout files with the new modulus:
    * that silently drops matching rows. Costs one schema-file read per
    * DISTINCT schemaId in the scan (cached), zero for the common
    * single-schema case.
    */
  def bucketPruner(store: FileStore, current: TableSchema,
      filters: Seq[Filter]): DataFileMeta => Boolean = {
    if (!current.hasBucketDirs) return _ => true
    // no pk constraint in the filters → no bucket set under ANY bucket
    // count — skip the per-schemaId resolution (and its schema-file reads)
    if (bucketsFromFilters(current, filters).isEmpty) return _ => true
    val bySchema = scala.collection.mutable.Map.empty[Long, Option[Set[Int]]]
    def bucketsFor(schemaId: Long): Option[Set[Int]] = bySchema.get(schemaId) match {
      case Some(v) => v
      case None =>
        val s = if (schemaId == current.id) current else store.readSchema(schemaId)
        val v = bucketsFromFilters(s, filters)
        bySchema(schemaId) = v
        v
    }
    f => bucketsFor(f.schemaId).forall(_.contains(f.bucket))
  }

  /** Column → value equalities pinned by AND-ed filters. */
  private def pinnedEqs(filters: Seq[Filter]): Map[String, Any] = {
    def eqs(f: Filter): Seq[(String, Any)] = f match {
      case SEqualTo(c, v) if v != null => Seq(c -> v)
      case SAnd(l, r) => eqs(l) ++ eqs(r)
      case _ => Nil
    }
    filters.flatMap(eqs).toMap
  }

  /** Raw Murmur3(seed 42) hash of a fully-pinned pk tuple — identical to
    * the write path's `functions.hash(pkCols)` and therefore to the key
    * hash stored in the dynamic-bucket index. None when the filters don't
    * pin every pk column with an equality.
    */
  def pkHashFromFilters(schema: TableSchema, filters: Seq[Filter]): Option[Int] = {
    if (!schema.isPrimaryKeyed) return None
    val pinned = pinnedEqs(filters)
    if (!schema.primaryKeys.forall(pinned.contains)) return None
    val lits = schema.primaryKeys.map { k =>
      val dt = schema.fieldByName(k).sparkType
      Literal.create(
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToCatalyst(pinned(k)), dt)
    }
    Some(Murmur3Hash(lits, 42).eval(InternalRow.empty).asInstanceOf[Int])
  }

  /** Buckets a fully-pinned pk equality can touch on a DYNAMIC-bucket
    * table, resolved from the snapshot's durable hash index (the
    * key-hash → bucket parquet files; reference: the HashBucketIndex the
    * dynamic-bucket point-lookup path loads). One columnar, pushdown-
    * filtered read of the index — at 100 TB a point lookup reads the
    * index plus exactly the mapped bucket instead of EVERY bucket.
    * None = not a pinned lookup (or no index yet — all buckets);
    * Some(empty) = key provably absent.
    */
  def dynamicBuckets(spark: SparkSession, store: FileStore, schema: TableSchema,
      indexFiles: Seq[String], filters: Seq[Filter]): Option[Set[Int]] = {
    if (!schema.dynamicBucket || indexFiles.isEmpty) return None
    import org.apache.spark.sql.functions.{col, lit}
    pkHashFromFilters(schema, filters).map { h =>
      spark.read
        .parquet(indexFiles.map(d => new Path(store.rootPath, d).toString): _*)
        .filter(col("__kh") === lit(h))
        .select(GraftMeta.BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet // O(hash collisions) rows
    }
  }

  /** xxhash64(seed 42) of a fully-pinned pk tuple — identical to the write
    * path's `functions.xxhash64(pkCols)` and therefore to the key hash in
    * the cross-partition GLOBAL index (GraftTable.globalIndexDelta). None
    * when the filters don't pin every pk column with an equality.
    */
  def pkXxHashFromFilters(schema: TableSchema, filters: Seq[Filter]): Option[Long] = {
    if (!schema.isPrimaryKeyed) return None
    val pinned = pinnedEqs(filters)
    if (!schema.primaryKeys.forall(pinned.contains)) return None
    val lits = schema.primaryKeys.map { k =>
      val dt = schema.fieldByName(k).sparkType
      Literal.create(
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToCatalyst(pinned(k)), dt)
    }
    Some(XxHash64(lits, 42L).eval(InternalRow.empty).asInstanceOf[Long])
  }

  /** (partition, bucket) groups a fully-pinned pk lookup can touch on a
    * CROSS_PARTITION table, resolved from the snapshot's global pk index
    * (every live row's location is indexed at the commit that added it —
    * see GraftTable.globalIndexDelta). At 100 TB a cross-partition point
    * lookup reads the index plus exactly the partitions that ever held the
    * key, instead of every partition of the key's bucket. Stale entries
    * only widen the set; Some(empty) = key provably absent.
    * None = not a pinned lookup, index disabled, or no index yet.
    */
  def crossPartitionGroups(spark: SparkSession, store: FileStore,
      schema: TableSchema, indexFiles: Seq[String],
      filters: Seq[Filter]): Option[Set[(String, Int)]] = {
    if (!schema.globalIndexEnabled || indexFiles.isEmpty) return None
    import org.apache.spark.sql.functions.{col, lit}
    pkXxHashFromFilters(schema, filters).map { h =>
      spark.read
        .parquet(indexFiles.map(d => new Path(store.rootPath, d).toString): _*)
        .filter(col("__kh") === lit(h))
        .select(col("__pt"), col(GraftMeta.BucketCol)).distinct()
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet // O(collisions)
    }
  }

  /** The set of buckets a pk-constraining predicate can touch: full-pk
    * equality pins one bucket; a single-column pk additionally prunes
    * through `IN` lists (each listed key hashes to its bucket — a
    * multi-key lookup on a 100-TB table reads at most |list| buckets).
    * None = no pk constraint (all buckets).
    */
  def bucketsFromFilters(schema: TableSchema, filters: Seq[Filter]): Option[Set[Int]] = {
    if (!schema.hasBucketDirs) return None
    val n = schema.numBuckets
    // dynamic-bucket tables (n == -1) route by the durable hash index, not
    // a modulus — no static bucket pruning (partition/stats pruning still
    // applies)
    if (n <= 0) return None

    def bucketOf(vals: Seq[(String, Any)]): Int = {
      val lits = vals.map { case (k, v) =>
        val dt = schema.fieldByName(k).sparkType
        Literal.create(
          org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v), dt)
      }
      val h = Murmur3Hash(lits, 42).eval(InternalRow.empty).asInstanceOf[Int]
      ((h % n) + n) % n
    }

    // routing hashes schema.bucketKeys (full pk unless 'bucket-key'
    // narrows it) — pruning needs exactly those columns pinned
    val pinned = pinnedEqs(filters)
    if (schema.bucketKeys.forall(pinned.contains))
      return Some(Set(bucketOf(schema.bucketKeys.map(k => k -> pinned(k)))))

    // single-column bucket key: any AND-ed IN list bounds the touched
    // buckets (null list entries match nothing, so dropping them is exact)
    if (schema.bucketKeys.length == 1) {
      val bk = schema.bucketKeys.head
      def inList(f: Filter): Option[Seq[Any]] = f match {
        case SIn(c, vs) if c == bk => Some(vs.toSeq.filter(_ != null))
        case SAnd(l, r) => inList(l).orElse(inList(r))
        case _ => None
      }
      filters.flatMap(inList(_)).headOption
        .map(vs => vs.map(v => bucketOf(Seq(bk -> v))).toSet)
    } else None
  }

  /** Spark partition-path string → Catalyst internal value. */
  def partitionValueToInternal(dt: DataType, s: String): Any = {
    if (s == PartitionPathUtils.NullPartitionValue) return null
    dt match {
      case StringType => UTF8String.fromString(s)
      case IntegerType => s.toInt
      case LongType => s.toLong
      case ShortType => s.toShort
      case ByteType => s.toByte
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case TimestampType | TimestampNTZType =>
        val t = java.sql.Timestamp.valueOf(s)
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
      case other => throw new IllegalArgumentException(s"unsupported partition type $other")
    }
  }
}
