package graft.spark.v2

import graft.table.GraftTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DSv2 exactly-once streaming sink (`writeStream.toTable` /
  * `.format("graft")` on a catalog table — reference surface:
  * PaimonSink.scala:31, which is the V1 analog; the V1 `graft` Sink remains
  * for path-addressed writes).
  *
  * Per epoch: executors spill the micro-batch to staging parquet (one file
  * per task, no driver data), then the driver-side `commit(epochId)` routes
  * the staged frame through the REGULAR table write — bucket shuffle,
  * pk sort, stats, manifest commit — with `commitIdentifier = epochId`, so
  * replays after failure dedupe exactly like the V1 sink (T3). The staged
  * double-write buys full reuse of the distributed write/merge path for the
  * price of one extra micro-batch-sized parquet pass.
  */
class GraftStreamingWrite(
    tablePath: String,
    dataSchema: StructType,
    queryId: String,
    conf: SerializableConfiguration) extends StreamingWrite {

  private def stagingRoot = s"$tablePath/tmp-streaming-$queryId"
  private def epochDir(epochId: Long) = s"$stagingRoot/epoch-$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(stagingRoot, dataSchema, conf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = new Path(epochDir(epochId))
    val fs = dir.getFileSystem(conf.value)
    try {
      val table = GraftTable.load(spark, tablePath)
      val files = messages.collect { case m: GraftStagedFile => m.path }
      if (files.nonEmpty) {
        val df = spark.read.schema(dataSchema).parquet(files.toIndexedSeq: _*)
        // exactly-once is scoped per WRITER: the query id is the commit
        // user, so two streaming queries with overlapping epoch sequences
        // never skip each other's batches (reference: Snapshot.commitUser)
        val snap =
          if (table.isPrimaryKeyed)
            table.upsert(df, commitIdentifier = epochId, commitUser = queryId)
          else table.append(df, commitIdentifier = epochId, commitUser = queryId)
        // sink lineage: job → table edge per committed epoch, read back by
        // the $sink_lineage system table (reference: SinkTableLineage)
        graft.core.Lineage.record(fs, new Path(tablePath), "sink", queryId,
          snap.id, epochId)
      }
    } finally {
      if (fs.exists(dir)) fs.delete(dir, true)
      // micro-batch epochs are serial: drop the staging root once empty
      val root = new Path(stagingRoot)
      if (fs.exists(root) && fs.listStatus(root).isEmpty) fs.delete(root, false)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(epochDir(epochId))
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir)) fs.delete(dir, true)
  }
}

private[v2] case class GraftStagedFile(path: String) extends WriterCommitMessage

private class GraftStreamWriterFactory(
    stagingRoot: String,
    dataSchema: StructType,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val file = new Path(
      s"$stagingRoot/epoch-$epochId/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.parquet")
    new GraftStagedParquetWriter(file, dataSchema, conf.value)
  }
}

/** Executor-side staged-parquet writer: Spark's own ParquetWriteSupport over
  * a synthetic task attempt, so the staged files match what
  * `spark.read.parquet` expects bit-for-bit.
  */
private[v2] class GraftStagedParquetWriter(
    file: Path,
    dataSchema: StructType,
    baseConf: Configuration) extends DataWriter[InternalRow] {

  private val writer: ParquetOutputWriter = {
    val conf = new Configuration(baseConf)
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS, classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(dataSchema, conf)
    // the keys ParquetFileFormat.prepareWrite sets for the batch writer —
    // ParquetWriteSupport.init asserts their presence
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    val attempt = new TaskAttemptID(new TaskID(new JobID("graft-stream", 0),
      TaskType.MAP, 0), 0)
    new ParquetOutputWriter(file.toString, new TaskAttemptContextImpl(conf, attempt))
  }

  override def write(record: InternalRow): Unit = writer.write(record)

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftStagedFile(file.toString)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = file.getFileSystem(baseConf)
    if (fs.exists(file)) fs.delete(file, false)
  }

  override def close(): Unit = ()
}
