package graft.spark

import graft.core.TableSchema
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `format("graft")` integration:
  *
  *  - batch read: `spark.read.format("graft").load(path)` — append tables
  *    (and `read-optimized=true` PK reads) resolve to a HadoopFsRelation over
  *    [[GraftFileIndex]], so partition pruning / stats skipping / vectorized
  *    parquet all apply. Merged (merge-on-read) PK reads need a plan on top
  *    of the scan, which DataSource V1 relations cannot express — use
  *    `Graft.load(spark, path)` or `GraftTable.load(...).toDF` for those
  *    (same integration style as the reference's Spark connector V1 write
  *    fallback: paimon-spark SparkWrite.scala:30).
  *  - batch write: `df.write.format("graft").option("primary-keys", ...)
  *    .save(path)` — creates the table on first write.
  *  - streaming read: snapshot-delta microbatches (offset = snapshot id),
  *    changelog rows with `_row_kind` (reference: DataTableStreamScan
  *    .java:51).
  *  - streaming write: idempotent per-batch commits keyed by batchId
  *    (reference: FileStoreCommitImpl.filterCommitted:202-207).
  */
class GraftDataSource extends RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft: 'path' must be specified"))

  /** With a user-specified schema: serve the real table when it exists;
    * otherwise a metadata-only placeholder. Spark's V1
    * `CreateDataSourceTableCommand` (the path `CREATE TABLE ... USING graft`
    * takes in a session catalog) resolves the relation just to validate the
    * schema BEFORE any data exists — [[graft.spark.v2.GraftSessionCatalog]]
    * materializes the actual layout on first access.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], userSchema: StructType): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    if (GraftTable.exists(spark, path)) createRelation(sqlContext, parameters)
    else new BaseRelation {
      override def sqlContext: SQLContext = spark.sqlContext
      override def schema: StructType = userSchema
    }
  }

  // ---------------- batch read ----------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = GraftTable.load(spark, pathOf(parameters))
    val snapshot = parameters.get("scan.snapshot-id") match {
      case Some(id) => Some(table.store.readSnapshot(id.toLong))
      case None => parameters.get("scan.tag-name") match {
        case Some(tag) => Some(table.store.readTag(tag))
        case None => table.store.latestSnapshot
      }
    }
    val readOptimized = parameters.get("read-optimized").exists(_.toBoolean)
    if (table.isPrimaryKeyed && !readOptimized) {
      throw new IllegalArgumentException(
        "graft: merged (merge-on-read) reads of primary-key tables need a " +
          "plan above the scan; use GraftTable.load(spark, path).toDF or the " +
          "DSv2 catalog (spark.sql.catalog.<name>), " +
          "or pass option read-optimized=true for compacted-only data")
    }
    val files = snapshot.map(table.store.liveFiles).getOrElse(Nil)
    val selected = if (readOptimized) files.filter(_.level >= GraftTable.MaxLevel) else files
    table.fsRelation(selected)
  }

  // ---------------- batch write ----------------

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val exists = GraftTable.exists(spark, path)
    val table =
      if (exists) GraftTable.load(spark, path)
      else {
        val pks = parameters.get("primary-keys").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val pts = parameters.get("partition-keys").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val reserved = Set("path", "primary-keys", "partition-keys")
        GraftTable.create(spark, path, data.schema, pts, pks,
          parameters -- reserved)
      }
    val mergeSchema = parameters.get("merge-schema").exists(_.toBoolean)
    mode match {
      case SaveMode.Append if mergeSchema => table.writeWithSchemaMerge(data)
      case SaveMode.Append => table.write(data)
      case SaveMode.Overwrite => table.overwrite(data)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"graft table already exists at $path")
      case SaveMode.Ignore if exists => ()
      case _ => table.write(data)
    }
    table.fsRelation(table.store.latestSnapshot.map(table.store.liveFiles).getOrElse(Nil))
  }

  // ---------------- streaming read ----------------

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val table = GraftTable.load(sqlContext.sparkSession, pathOf(parameters))
    ("graft", GraftSource.schemaFor(table))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftSource(sqlContext.sparkSession, pathOf(parameters), parameters)

  // ---------------- streaming write ----------------

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink =
    new GraftSink(sqlContext.sparkSession, pathOf(parameters), parameters)
}

/** Microbatch source over the snapshot chain: each batch is the raw delta of
  * snapshots (start, end], with `_row_kind`/`_sequence_number` changelog
  * columns — `changelog-producer = input` semantics (reference:
  * DeltaFollowUpScanner.java:29, PaimonMicroBatchStream.scala:32).
  *
  * Offsets are snapshot ids, so replay after failure re-plans the same
  * snapshot range — exactly-once with a downstream idempotent sink.
  */
class GraftSource(spark: SparkSession, path: String,
    options: Map[String, String]) extends Source {

  private val table = GraftTable.load(spark, path)
  /** Start mode: latest-full / latest / from-snapshot / from-timestamp /
    * from-watermark — see [[GraftTable.streamingStartExclusive]].
    */
  private val startExclusive: Long = table.streamingStartExclusive(options)

  // source lineage: job → table read edge, once per query run
  graft.core.Lineage.record(table.store.fs, table.store.rootPath, "source",
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("unknown"),
    table.store.latestSnapshotId.getOrElse(-1L))

  override def schema: StructType = GraftSource.schemaFor(table)

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    table.store.latestSnapshotId.filter(_ > startExclusive).map(LongOffset(_))

  private val fullFirst = table.streamingFullFirst(options)

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val from = start.map(o => o.json().toLong).getOrElse(startExclusive)
    val to = end.json().toLong
    // durable read progress at PLAN time (see GraftMicroBatchStream
    // .planInputPartitions): Spark never calls commit() after the final
    // AvailableNow batch, so the in-flight batch's exclusive start is the
    // crash-safe pin; commit() below advances it when Spark does call it.
    options.get("consumer-id").foreach(id => table.store.writeConsumer(id, from + 1))
    // latest-full / from-snapshot-full: the FIRST batch (start = None, so
    // deterministic under checkpoint recovery) is the full merged state as
    // of the batch end — a delta replay from 0 would silently lose rows
    // once expiration dropped early snapshots (reference:
    // FullStartingScanner). Later batches are plain delta replays.
    val frame =
      if (fullFirst && start.isEmpty) GraftSource.fullFrame(table, to)
      else table.incremental(from, to)
    org.apache.spark.sql.graft.SparkShims.asStreamingFrame(frame)
  }

  override def commit(end: org.apache.spark.sql.execution.streaming.Offset): Unit = {
    // durable read progress, pins snapshots from expiry (reference:
    // consumer files, Consumer.java:36)
    options.get("consumer-id").foreach { id =>
      table.store.writeConsumer(id, end.json().toLong + 1)
    }
  }

  override def stop(): Unit = ()
}

object GraftSource {
  def schemaFor(table: GraftTable): StructType = {
    import org.apache.spark.sql.types._
    StructType(
      StructField("_row_kind", StringType) +:
      StructField("_sequence_number", LongType) +:
      table.schema.structType.fields.toIndexedSeq)
  }

  /** Full merged state as of snapshot `to`, shaped like the changelog
    * schema: every live row is a +I at sequence `to`.
    */
  def fullFrame(table: GraftTable, to: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    table.toDF(to).select(
      lit("+I").as("_row_kind") +: lit(to).as("_sequence_number") +:
        table.schema.structType.fields.toIndexedSeq.map(f => col(f.name)): _*)
  }
}

/** Streaming sink: per-epoch commit carrying the batch id as the commit
  * identifier; replayed batches are recognized and skipped, giving
  * exactly-once (reference: PaimonSink.scala:31 + commitIdentifier dedup).
  */
class GraftSink(spark: SparkSession, path: String,
    options: Map[String, String]) extends Sink {

  override def name(): String = s"GraftSink[$path]"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val table =
      if (GraftTable.exists(spark, path)) GraftTable.load(spark, path)
      else {
        val pks = options.get("primary-keys").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val pts = options.get("partition-keys").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        GraftTable.create(spark, path, data.schema, pts, pks,
          options -- Set("path", "primary-keys", "partition-keys", "checkpointLocation"))
      }
    // rebind over the SAME physical rows — no re-analysis, no second read
    // of the micro-batch source
    val fresh = org.apache.spark.sql.graft.SparkShims.rebindMicroBatch(data)
    // per-writer exactly-once scope: the checkpoint location is stable for
    // a query's lifetime and distinct across queries (Snapshot.commitUser)
    val user = options.getOrElse("checkpointLocation", "")
    val snap =
      if (table.isPrimaryKeyed)
        table.upsert(fresh, commitIdentifier = batchId, commitUser = user)
      else table.append(fresh, commitIdentifier = batchId, commitUser = user)
    // sink lineage: job → table edge per committed epoch ($sink_lineage)
    graft.core.Lineage.record(table.store.fs, table.store.rootPath, "sink",
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
        .getOrElse(user),
      snap.id, batchId)
  }
}
