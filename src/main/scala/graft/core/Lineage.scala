package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Table lineage records (reference: paimon-core `table/system/
  * SourceTableLineageTable.java` / `SinkTableLineageTable.java` — there
  * fed by a Flink-runtime lineage meta store; here the Spark streaming
  * source and sinks record directly into the table's own metadata).
  *
  * Layout: `<table root>/lineage/{source|sink}/<uuid>.json`, one record
  * per event —
  *  - '''sink''': one per committed streaming epoch
  *    `{job, barrierId (epoch), snapshotId, atMillis}`
  *  - '''source''': one per streaming-query run registration
  *    `{job, snapshotId (read start), atMillis}`
  *
  * `job` is the Spark streaming query id (the sink's exactly-once
  * commitUser; the source reads the `sql.streaming.queryId` local
  * property the stream-execution thread sets). Records whose snapshot has
  * fallen off the retention horizon are pruned by snapshot expiration —
  * lineage never outgrows the table's own history. All IO is
  * best-effort: a lineage failure must never fail the data path.
  */
object Lineage {
  final case class Record(kind: String, job: String, snapshotId: Long,
      barrierId: Long, atMillis: Long)

  private def dir(root: Path, kind: String) =
    new Path(new Path(root, "lineage"), kind)

  def record(fs: FileSystem, tableRoot: Path, kind: String, job: String,
      snapshotId: Long, barrierId: Long = -1L): Unit =
    try {
      val d = dir(tableRoot, kind)
      fs.mkdirs(d)
      val n = Json.obj()
      n.put("job", job)
      n.put("snapshotId", snapshotId)
      n.put("barrierId", barrierId)
      n.put("atMillis", System.currentTimeMillis())
      val p = new Path(d, s"${java.util.UUID.randomUUID()}.json")
      val out = fs.create(p, true)
      try out.write(Json.write(n).getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: java.io.IOException => () }

  def list(fs: FileSystem, tableRoot: Path, kind: String): Seq[Record] =
    try fs.listStatus(dir(tableRoot, kind)).toSeq.filter(_.isFile).flatMap { s =>
      try {
        val in = fs.open(s.getPath)
        val content = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        val n = Json.parse(content)
        Some(Record(kind, Json.optStr(n, "job").getOrElse(""),
          Json.optLong(n, "snapshotId").getOrElse(-1L),
          Json.optLong(n, "barrierId").getOrElse(-1L),
          Json.optLong(n, "atMillis").getOrElse(0L)))
      } catch { case _: java.io.IOException => None }
    } catch { case _: java.io.IOException => Nil }

  /** Drop records referencing snapshots older than `earliestLive` (called
    * from snapshot expiration, so lineage follows the table's retention
    * horizon). Source records keep their last entry per job even when
    * stale — a reader's registration stays visible as long as the job is
    * the latest reader state we know.
    */
  def prune(fs: FileSystem, tableRoot: Path, earliestLive: Long): Unit =
    try {
      for (kind <- Seq("source", "sink")) {
        val d = dir(tableRoot, kind)
        if (fs.exists(d)) {
          val recs = fs.listStatus(d).toSeq.filter(_.isFile).map { s =>
            val in = fs.open(s.getPath)
            val content = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
              finally in.close()
            (s.getPath, Json.parse(content))
          }
          val keepLatestPerJob: Set[Path] =
            if (kind != "source") Set.empty
            else recs.groupBy(r => Json.optStr(r._2, "job").getOrElse(""))
              .values.map(_.maxBy(r => Json.optLong(r._2, "atMillis")
                .getOrElse(0L))._1).toSet
          recs.foreach { case (p, n) =>
            val snap = Json.optLong(n, "snapshotId").getOrElse(-1L)
            if (snap >= 0 && snap < earliestLive && !keepLatestPerJob.contains(p))
              fs.delete(p, false)
          }
        }
      }
    } catch { case _: java.io.IOException => () }
}
