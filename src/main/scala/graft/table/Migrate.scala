package graft.table

import graft.core.{ColStats, DataFileMeta, ManifestEntry, PartitionPathUtils, StatsCodec}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adopt an existing parquet directory as a graft table WITHOUT rewriting
  * any data file (reference capability: the `migrate_table` / `migrate_file`
  * Spark procedures, paimon-spark/.../procedure/MigrateTableProcedure.java).
  *
  * Manifest entries store the source files' ABSOLUTE paths — the read path
  * resolves `new Path(tableRoot, storedPath)`, where an absolute stored path
  * wins, so scans serve the original files in place. The migrated table is
  * therefore not relocatable until a compaction rewrites the adopted files
  * into the table's own `data/` layout (any full/small-file compaction does
  * this as a side effect).
  *
  * Scale shape: one metadata-only Spark pass computes per-file row counts
  * and min/max/null stats grouped by `_metadata.file_path` (executors read,
  * driver receives O(files) rows); partition values parse from the
  * `key=value` directory segments — identical to what a fresh write would
  * have produced, so file skipping and partition pruning work immediately.
  */
object Migrate {

  def parquetTable(
      spark: SparkSession,
      sourceDir: String,
      targetPath: String,
      options: Map[String, String] = Map.empty): GraftTable = {
    val src = spark.read.parquet(sourceDir)
    val partitionKeys = src.schema.fields.map(_.name).toSeq
      .filter(discoveredPartitionCols(spark, sourceDir).contains)
    val t = GraftTable.create(spark, targetPath, src.schema,
      partitionKeys = partitionKeys, options = options)
    adopt(spark, sourceDir, t)
  }

  /** Adopt the parquet files of `sourceDir` into an EXISTING append table
    * without rewriting them (reference: `migrate_file` Spark procedure,
    * MigrateFileProcedure.java:42 — moves another table's files into a
    * target). Source columns must cover the target's schema by name; the
    * source's partition directories must match the target's partition keys.
    */
  def parquetFilesInto(spark: SparkSession, sourceDir: String,
      t: GraftTable): GraftTable = {
    require(!t.isPrimaryKeyed, "migrate_file targets append tables " +
      "(a primary-key table needs bucketed, pk-sorted files)")
    require(!t.schema.appendBucketed, "migrate_file targets UNBUCKETED " +
      "append tables: adopted files are not hash-routed, so bucket pruning " +
      "on the target would silently skip their rows")
    val src = spark.read.parquet(sourceDir)
    val missing = t.schema.fields.map(_.name).toSet -- src.schema.fieldNames.toSet
    require(missing.isEmpty, s"source lacks columns: ${missing.mkString(",")}")
    adopt(spark, sourceDir, t)
  }

  private def adopt(spark: SparkSession, sourceDir: String,
      t: GraftTable): GraftTable = {
    val src = spark.read.parquet(sourceDir)
    val partitionKeys = t.schema.partitionKeys

    // stats columns: skip strings (write-path string stats carry a
    // truncation protocol; absent stats are soundly un-prunable)
    val tFields = t.schema.fields.map(_.name).toSet
    val statCols = src.schema.fields.toSeq.filter(f => tFields.contains(f.name)).filter { f =>
      f.dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType |
             BooleanType => true
        case _ => false
      }
    }.filterNot(f => partitionKeys.contains(f.name))
    val aggs =
      count(lit(1)).as("__cnt") +:
        statCols.zipWithIndex.flatMap { case (f, i) =>
          Seq(min(col(f.name)).as(s"__mn$i"), max(col(f.name)).as(s"__mx$i"),
            sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nc$i"))
        }
    val perFile = src
      .select((col("_metadata.file_path").as("__path") +:
        src.schema.fields.map(f => col(f.name))): _*)
      .groupBy("__path").agg(aggs.head, aggs.tail: _*)
      .collect()

    val fs = t.store.fs
    val entries = perFile.toSeq.map { r =>
      val uri = new java.net.URI(r.getAs[String]("__path"))
      val p = new Path(uri.getPath)
      val segs = uri.getPath.split('/').dropRight(1)
        .filter(_.contains('=')).map { s =>
          val i = s.indexOf('='); s.take(i) -> PartitionPathUtils.unescape(s.drop(i + 1))
        }.toMap
      val ptValues = partitionKeys.map(k =>
        segs.getOrElse(k, PartitionPathUtils.NullPartitionValue))
      val stats = statCols.zipWithIndex.map { case (f, i) =>
        f.name -> ColStats(
          StatsCodec.encode(f.dataType, r.get(r.fieldIndex(s"__mn$i"))),
          StatsCodec.encode(f.dataType, r.get(r.fieldIndex(s"__mx$i"))),
          r.getAs[Long](s"__nc$i"))
      }.toMap
      ManifestEntry(ManifestEntry.ADD, DataFileMeta(
        path = p.toString, // absolute: served in place
        size = fs.getFileStatus(p).getLen,
        rowCount = r.getAs[Long]("__cnt"),
        partition = ptValues,
        bucket = 0,
        level = 0,
        minSeq = 1L, maxSeq = 1L,
        schemaId = t.schema.id,
        stats = stats))
    }
    t.commitFiles(entries, "APPEND")
    t
  }

  /** Partition columns Spark discovered from key=value directories: present
    * in the resolved schema but absent from the physical parquet footers.
    */
  private def discoveredPartitionCols(spark: SparkSession, dir: String): Set[String] = {
    val resolved = spark.read.parquet(dir)
    val firstFile = resolved.select(col("_metadata.file_path")).limit(1)
      .collect().headOption.map(_.getString(0))
    firstFile match {
      case None => Set.empty
      case Some(f) =>
        val physical = spark.read.parquet(f).schema.fieldNames.toSet
        resolved.schema.fieldNames.toSet -- physical
    }
  }
}
