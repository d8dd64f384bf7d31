package graft.table

import graft.core.{ManifestEntry, TableSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** System tables exposing table metadata as queryable DataFrames
  * (reference: paimon-core table/system — 21 tables; we expose the useful
  * set; `audit_log` and `read_optimized` are real data reads defined on
  * [[GraftTable]]).
  */
trait SystemTables { self: GraftTable =>

  /** `table.system("snapshots")` etc. */
  def system(name: String): DataFrame = name match {
    case "snapshots" => snapshotsTable
    case "schemas" => schemasTable
    case "files" => filesTable
    case "manifests" => manifestsTable
    case "partitions" => partitionsTable
    case "buckets" => bucketsTable
    case "options" => optionsTable
    case "tags" => tagsTable
    case "branches" => branchesTable
    case "consumers" => consumersTable
    case "audit_log" => auditLog
    case "read_optimized" => readOptimized
    case "table_indexes" => tableIndexesTable
    case "statistics" => statisticsTable
    case "aggregation_fields" => aggregationFieldsTable
    case "file_monitor" => fileMonitorTable
    case "locks" => locksTable
    case "source_lineage" => lineageTable("source")
    case "sink_lineage" => lineageTable("sink")
    case other => throw new IllegalArgumentException(s"unknown system table: $other")
  }

  /** Streaming lineage edges recorded by the graft source/sinks
    * (reference: table/system/SourceTableLineageTable.java and
    * SinkTableLineageTable.java — there fed by a Flink lineage meta
    * store; here the Spark streaming paths record directly, see
    * [[graft.core.Lineage]]). `job` is the streaming query id; sink rows
    * carry the committed epoch (barrier) and resulting snapshot, source
    * rows the snapshot the run registered at. O(records) driver listing,
    * pruned along the snapshot retention horizon.
    */
  private def lineageTable(kind: String): DataFrame = {
    val st = StructType(Seq(
      StructField("job", StringType), StructField("snapshot_id", LongType),
      StructField("barrier_id", LongType),
      StructField("create_time", TimestampType)))
    local(st, graft.core.Lineage.list(store.fs, store.rootPath, kind).map(r =>
      Row(r.job, r.snapshotId, r.barrierId, new java.sql.Timestamp(r.atMillis))))
  }

  private def local(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  private def snapshotsTable: DataFrame = {
    val st = StructType(Seq(
      StructField("snapshot_id", LongType), StructField("schema_id", LongType),
      StructField("commit_user", StringType),
      StructField("commit_kind", StringType), StructField("commit_identifier", LongType),
      StructField("total_record_count", LongType), StructField("watermark", LongType),
      StructField("commit_time", TimestampType)))
    local(st, store.snapshotIds.map(store.readSnapshot).map(s =>
      Row(s.id, s.schemaId, s.commitUser, s.commitKind, s.commitIdentifier,
        s.totalRecordCount,
        s.watermark.map(Long.box).orNull, new java.sql.Timestamp(s.timestampMs))))
  }

  private def schemasTable: DataFrame = {
    val st = StructType(Seq(
      StructField("schema_id", LongType), StructField("fields", StringType),
      StructField("partition_keys", StringType), StructField("primary_keys", StringType),
      StructField("options", StringType)))
    val ids = 0L to store.latestSchemaId
    local(st, ids.map(store.readSchema).map(s =>
      Row(s.id, s.fields.map(f => s"${f.id}:${f.name}:${f.dataType}").mkString(","),
        s.partitionKeys.mkString(","), s.primaryKeys.mkString(","),
        s.options.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","))))
  }

  /** Commit-lock observability for the `lock` [[graft.core.CommitStore]]:
    * live `.lock`/`.breaker` holders (token + age) and the `.lock-events`
    * stale-break audit trail written by `LockFileCommitStore` — so
    * operators see crash-recovery lock breaking (who broke whose lock,
    * how stale it was) before contention becomes an availability problem.
    * Empty under the default rename store. O(locks) driver listing —
    * metadata-scale by construction.
    */
  private def locksTable: DataFrame = {
    val st = StructType(Seq(
      StructField("kind", StringType), StructField("lock", StringType),
      StructField("token", StringType), StructField("age_ms", LongType),
      StructField("breaker_token", StringType),
      StructField("event_time", TimestampType)))
    val fs = store.fs
    val now = System.currentTimeMillis()
    val held: Seq[Row] =
      try fs.listStatus(store.snapshotDir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".lock"))
        .map { s =>
          val tok = try {
            val in = fs.open(s.getPath)
            try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8) finally in.close()
          } catch { case _: java.io.IOException => null }
          Row("held", s.getPath.getName, tok, now - s.getModificationTime,
            null, new java.sql.Timestamp(s.getModificationTime))
        }
      catch { case _: java.io.IOException => Nil }
    val evDir = new org.apache.hadoop.fs.Path(store.snapshotDir, ".lock-events")
    val broken: Seq[Row] =
      try fs.listStatus(evDir).toSeq.filter(_.isFile).map { s =>
        val in = fs.open(s.getPath)
        val content = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        val n = graft.core.Json.parse(content)
        Row("broken", graft.core.Json.optStr(n, "lock").orNull,
          graft.core.Json.optStr(n, "brokenToken").orNull,
          graft.core.Json.optLong(n, "ageMs").map(Long.box).map(_.longValue).getOrElse(-1L),
          graft.core.Json.optStr(n, "breakerToken").orNull,
          graft.core.Json.optLong(n, "atMillis")
            .map(new java.sql.Timestamp(_)).orNull)
      } catch { case _: java.io.IOException => Nil }
    local(st, held ++ broken)
  }

  /** DISTRIBUTED live-file frame: the driver ships only manifest NAMES;
    * executors read + parse the manifest shards and the ADD/DELETE fold is
    * a distributed arg-max per path — at 10⁷ files nothing O(files) ever
    * touches the driver (reference: table/system/FilesTable.java, which
    * also scans manifests lazily).
    */
  /** Per-manifest-entry frame, parsed executor-side: the driver ships only
    * manifest NAMES. Shared by [[liveFilesDF]] and [[manifestsTable]].
    */
  private def manifestEntriesDF: DataFrame = {
    import spark.implicits._
    val names = store.latestSnapshot.map(_.manifests).getOrElse(Nil)
    val mDir = store.manifestDir.toString
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // cap fan-out by cluster width, not a literal: at 10⁵ manifest shards
    // on a 1000-executor cluster the fold should use every core
    spark.createDataset(names.zipWithIndex)
      .repartition(math.max(1,
        math.min(names.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (name, ord) =>
        val p = new org.apache.hadoop.fs.Path(mDir, name)
        val fs = p.getFileSystem(serConf.value)
        val in = fs.open(p)
        val content = try in.readAllBytes() finally in.close()
        graft.core.ManifestCodec.entriesFromAny(content).map { e =>
          val f = e.file
          (name, ord, e.kind, f.path, f.partition.mkString("/"), f.bucket, f.level,
            f.rowCount, f.size, f.minSeq, f.maxSeq, f.schemaId,
            f.dvPath.orNull, f.dvCount,
            f.blooms.toSeq.sorted.map { case (c, p) => s"$c=$p" }.mkString(";"))
        }
      }
      .toDF("__manifest", "__ord", "__kind", "file_path", "partition", "bucket",
        "level", "row_count", "file_size_in_bytes", "min_sequence_number",
        "max_sequence_number", "schema_id", "__dv_path", "__dv_count", "__blooms")
  }

  private def liveFilesDF: DataFrame = {
    val entries = manifestEntriesDF.drop("__manifest")
    // a path appears at most once per manifest; the latest entry decides
    entries.groupBy("file_path")
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct(entries.columns.map(
          org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.col("__ord")).as("e"))
      .select("e.*")
      .filter(org.apache.spark.sql.functions.col("__kind") === ManifestEntry.ADD)
      .drop("__ord", "__kind")
  }

  private def filesTable: DataFrame =
    liveFilesDF.drop("__dv_path", "__dv_count", "__blooms")

  /** Index sidecars of live files — deletion vectors and bloom filters
    * (distributed, from the same manifest fold as `$files`) plus
    * snapshot-level index files (dynamic-bucket hash index; O(buckets),
    * driver-side).
    */
  private def tableIndexesTable: DataFrame = {
    import org.apache.spark.sql.functions._
    val live = liveFilesDF
    val dv = live.filter(col("__dv_path").isNotNull)
      .select(lit("DELETION_VECTOR").as("index_type"), col("__dv_path").as("index_path"),
        col("file_path").as("data_file_path"), col("partition"), col("bucket"),
        col("__dv_count").as("entry_count"))
    val blooms = live.filter(col("__blooms") =!= "")
      .select(explode(split(col("__blooms"), ";")).as("b"),
        col("file_path"), col("partition"), col("bucket"))
      .select(concat(lit("BLOOM_FILTER:"), substring_index(col("b"), "=", 1)).as("index_type"),
        substring_index(col("b"), "=", -1).as("index_path"),
        col("file_path").as("data_file_path"), col("partition"), col("bucket"),
        lit(0L).as("entry_count"))
    val st = StructType(Seq(
      StructField("index_type", StringType), StructField("index_path", StringType),
      StructField("data_file_path", StringType), StructField("partition", StringType),
      StructField("bucket", IntegerType), StructField("entry_count", LongType)))
    val hashIdx = local(st,
      store.latestSnapshot.map(_.indexFiles).getOrElse(Nil).map(p =>
        Row("HASH_BUCKET_INDEX", p, null, null, 0, 0L)))
    dv.unionByName(blooms).unionByName(hashIdx)
  }

  /** DISTRIBUTED per-manifest aggregates: executors parse the shards (same
    * fold as `$files`) and the per-manifest counts are a map-side-combined
    * groupBy — no driver-side readManifest loop, O(1) driver work at 10⁷
    * files (reference: table/system/ManifestsTable.java reads lazily).
    */
  private def manifestsTable: DataFrame = {
    import org.apache.spark.sql.functions._
    val isAdd = col("__kind") === ManifestEntry.ADD
    manifestEntriesDF
      .groupBy(col("__manifest").as("manifest"))
      .agg(
        sum(when(isAdd, 1L).otherwise(0L)).as("num_added_files"),
        sum(when(!isAdd, 1L).otherwise(0L)).as("num_deleted_files"),
        sum(when(isAdd, col("row_count")).otherwise(0L)).as("added_rows"),
        sum(when(!isAdd, col("row_count")).otherwise(0L)).as("deleted_rows"))
      .orderBy("manifest")
  }

  /** Per-snapshot file changes, one row per (snapshot, partition, bucket)
    * with the files the commit removed (`before_files`) and added
    * (`data_files`) — the monitoring feed a downstream compactor or
    * replicator tails (reference: table/system/FileMonitorTable.java:57).
    * DISTRIBUTED like `$files`: the driver ships (snapshot, delta-manifest
    * NAME) pairs; executors parse the shards.
    */
  private def fileMonitorTable: DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // O(snapshots) driver-side metadata: one JSON read per snapshot
    val pairs = store.snapshotIds.map(store.readSnapshot)
      .flatMap(s => s.deltaManifests.map(m => (s.id, m)))
    val mDir = store.manifestDir.toString
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val entries = spark.createDataset(pairs)
      .repartition(math.max(1,
        math.min(pairs.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (sid, name) =>
        val p = new org.apache.hadoop.fs.Path(mDir, name)
        val fs = p.getFileSystem(serConf.value)
        val in = fs.open(p)
        val content = try in.readAllBytes() finally in.close()
        graft.core.ManifestCodec.entriesFromAny(content).map { e =>
          (sid, e.kind, e.file.partition.mkString("/"), e.file.bucket, e.file.path)
        }
      }
      .toDF("snapshot_id", "__kind", "partition", "bucket", "file_path")
    entries.groupBy("snapshot_id", "partition", "bucket")
      .agg(
        sort_array(collect_list(when(col("__kind") === ManifestEntry.DELETE,
          col("file_path")))).as("before_files"),
        sort_array(collect_list(when(col("__kind") === ManifestEntry.ADD,
          col("file_path")))).as("data_files"))
      .orderBy("snapshot_id", "partition", "bucket")
  }

  private def partitionsTable: DataFrame = {
    import org.apache.spark.sql.functions._
    liveFilesDF.groupBy("partition")
      .agg(sum("row_count").as("record_count"),
        count(lit(1)).as("file_count"),
        sum("file_size_in_bytes").as("file_size_in_bytes"))
      .orderBy("partition")
  }

  private def bucketsTable: DataFrame = {
    import org.apache.spark.sql.functions._
    liveFilesDF.groupBy("partition", "bucket")
      .agg(sum("row_count").as("record_count"),
        count(lit(1)).as("file_count"))
      .orderBy("partition", "bucket")
  }

  private def optionsTable: DataFrame = {
    val st = StructType(Seq(StructField("key", StringType), StructField("value", StringType)))
    local(st, schema.options.toSeq.sorted.map { case (k, v) => Row(k, v) })
  }

  private def tagsTable: DataFrame = {
    val st = StructType(Seq(
      StructField("tag_name", StringType), StructField("snapshot_id", LongType),
      StructField("record_count", LongType)))
    local(st, store.listTags.map { case (n, s) => Row(n, s.id, s.totalRecordCount) })
  }

  private def branchesTable: DataFrame = {
    val st = StructType(Seq(
      StructField("branch_name", StringType), StructField("head_snapshot_id", LongType),
      StructField("record_count", LongType)))
    local(st, store.listBranches.map { b =>
      val s = store.ofBranch(b).latestSnapshot
      Row(b, s.map(x => Long.box(x.id)).orNull,
        s.map(x => Long.box(x.totalRecordCount)).orNull)
    })
  }

  /** Last ANALYZE output (reference: table/system/StatisticTable.java:71). */
  private def statisticsTable: DataFrame = {
    val st = StructType(Seq(
      StructField("snapshot_id", LongType), StructField("rowCount", LongType),
      StructField("column", StringType), StructField("ndv", LongType),
      StructField("null_count", LongType), StructField("min", StringType),
      StructField("max", StringType), StructField("avg_len", LongType),
      StructField("max_len", LongType)))
    val rows = store.readColStats().toSeq.flatMap { s =>
      s.cols.toSeq.sortBy(_._1).map { case (name, c) =>
        Row(s.snapshotId, s.rowCount, name, c.ndv, c.nullCount,
          c.min.orNull, c.max.orNull,
          c.avgLen.map(Long.box).orNull, c.maxLen.map(Long.box).orNull)
      }
    }
    local(st, rows)
  }

  /** Per-field aggregate functions of an aggregation-engine table
    * (reference: table/system/AggregationFieldsTable.java:91).
    */
  private def aggregationFieldsTable: DataFrame = {
    val st = StructType(Seq(
      StructField("field_name", StringType), StructField("field_type", StringType),
      StructField("function", StringType), StructField("function_options", StringType)))
    local(st, schema.fields.map { f =>
      val func =
        if (schema.primaryKeys.contains(f.name)) "primary-key"
        else schema.options.getOrElse(TableSchema.aggFuncOpt(f.name),
          if (schema.mergeEngine == "aggregation") "last_non_null_value" else "")
      val opts = schema.options.toSeq
        .filter { case (k, _) => k.startsWith(s"fields.${f.name}.") && !k.endsWith(".aggregate-function") }
        .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
      Row(f.name, f.dataType, func, opts)
    })
  }

  private def consumersTable: DataFrame = {
    val st = StructType(Seq(
      StructField("consumer_id", StringType), StructField("next_snapshot", LongType)))
    val fs = store.fs
    val rows = if (!fs.exists(store.consumerDir)) Nil else
      fs.listStatus(store.consumerDir).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("consumer-") && n.endsWith(".json"))
        .map(_.stripPrefix("consumer-").stripSuffix(".json")).sorted
        .map(id => Row(id, store.readConsumer(id).map(Long.box).orNull))
    local(st, rows)
  }
}

/** Catalog-level system tables — metadata spanning every table under a
  * warehouse directory (reference: table/system/AllTableOptionsTable.java,
  * CatalogOptionsTable.java, exposed as `sys.all_table_options` /
  * `sys.catalog_options`). Reached through the `graft_system` TVF with the
  * WAREHOUSE path as the first argument.
  */
object CatalogSystemTables {
  import org.apache.spark.sql.SparkSession
  import org.apache.hadoop.fs.Path

  val Names: Set[String] = Set("all_table_options", "catalog_options",
    "source_table_lineage", "sink_table_lineage")

  def apply(spark: SparkSession, warehouse: String, name: String): DataFrame =
    name match {
      case "all_table_options" => allTableOptions(spark, warehouse)
      case "catalog_options" => catalogOptions(spark, warehouse)
      case "source_table_lineage" => tableLineage(spark, warehouse, "source")
      case "sink_table_lineage" => tableLineage(spark, warehouse, "sink")
      case other => throw new IllegalArgumentException(
        s"unknown catalog system table: $other")
    }

  /** Catalog-wide lineage: every table's source/sink edges under the
    * warehouse, with database/table columns (reference:
    * sys.source_table_lineage / sys.sink_table_lineage). O(tables +
    * records) driver listing — metadata-scale.
    */
  def tableLineage(spark: SparkSession, warehouse: String,
      kind: String): DataFrame = {
    val st = StructType(Seq(
      StructField("database_name", StringType), StructField("table_name", StringType),
      StructField("job", StringType), StructField("snapshot_id", LongType),
      StructField("barrier_id", LongType),
      StructField("create_time", TimestampType)))
    val wh = new Path(warehouse)
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val rows =
      if (!fs.exists(wh)) Nil
      else for {
        db <- fs.listStatus(wh).toSeq.filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
        td <- fs.listStatus(db).toSeq.filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
        if GraftTable.exists(spark, td.toString)
        r <- graft.core.Lineage.list(fs, td, kind)
      } yield Row(db.getName, td.getName, r.job, r.snapshotId, r.barrierId,
        new java.sql.Timestamp(r.atMillis))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)
  }

  /** One row per (database, table, option key): the declared options of
    * every graft table under the warehouse. Metadata-scale — O(tables) —
    * listed on the driver like the reference's catalog-backed loader.
    */
  def allTableOptions(spark: SparkSession, warehouse: String): DataFrame = {
    val st = StructType(Seq(
      StructField("database_name", StringType), StructField("table_name", StringType),
      StructField("key", StringType), StructField("value", StringType)))
    val wh = new Path(warehouse)
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val rows =
      if (!fs.exists(wh)) Nil
      else for {
        db <- fs.listStatus(wh).toSeq.filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
        td <- fs.listStatus(db).toSeq.filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
        if GraftTable.exists(spark, td.toString)
        (k, v) <- GraftTable.load(spark, td.toString).schema.options.toSeq.sortBy(_._1)
      } yield Row(db.getName, td.getName, k, v)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)
  }

  /** The catalog's own configuration (reference: CatalogOptionsTable). */
  def catalogOptions(spark: SparkSession, warehouse: String): DataFrame = {
    val st = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("warehouse", warehouse)), 1), st)
  }
}
