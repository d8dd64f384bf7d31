package graft.core

import com.fasterxml.jackson.databind.JsonNode

/** Per-column min/max/nullCount, the substrate for file skipping
  * (reference: paimon-core org/apache/paimon/stats/SimpleStats.java:44-52).
  * min/max are encoded as strings: numerics via toString, timestamps as epoch
  * micros, dates as epoch days, booleans as true/false. Complex types carry
  * no stats (None).
  */
case class ColStats(min: Option[String], max: Option[String], nullCount: Long)

/** Immutable metadata of one data file (reference: paimon-core
  * org/apache/paimon/io/DataFileMeta.java:54). `path` is relative to the
  * table root so the table stays relocatable.
  */
case class DataFileMeta(
    path: String,
    size: Long,
    rowCount: Long,
    partition: Seq[String], // values aligned with schema.partitionKeys
    bucket: Int,
    level: Int,
    minSeq: Long,
    maxSeq: Long,
    schemaId: Long,
    stats: Map[String, ColStats],
    /** Deletion vector sidecar: bitmap of deleted row positions + its
      * cardinality (reference: deletionvectors/DeletionVector.java:39,76).
      */
    dvPath: Option[String] = None,
    dvCount: Long = 0L,
    /** Bloom index sidecars, column name → path (reference:
      * fileindex/bloomfilter/BloomFilterFileIndex.java:48-95).
      */
    blooms: Map[String, String] = Map.empty) {
  def liveRowCount: Long = rowCount - dvCount
}

object ManifestEntry {
  val ADD = 0
  val DELETE = 1
}

/** One ADD/DELETE of a data file (reference: paimon-core
  * org/apache/paimon/manifest/ManifestEntry.java:41).
  */
case class ManifestEntry(kind: Int, file: DataFileMeta)

object CommitKind {
  val APPEND = "APPEND"
  val COMPACT = "COMPACT"
  val OVERWRITE = "OVERWRITE"
}

/** Driver-side summary of one manifest file, stored in the snapshot so
  * planning can SKIP manifest shards without reading them (reference:
  * ManifestList entries with partition stats — ManifestFileMeta.java:148,
  * ManifestList.java:40). `ptMin`/`ptMax` bound the partition values of an
  * add-only (folded) shard in the typed sort order used when packing;
  * non-add-only manifests (live deltas) must always be read.
  */
case class ManifestMeta(
    name: String,
    entries: Long,
    dataSize: Long,
    addOnly: Boolean,
    schemaIds: Seq[Long],
    ptMin: Option[Seq[String]],
    ptMax: Option[Seq[String]],
    /** Total deletion-vector cardinality of ADD entries — lets planning
      * know DV-free snapshots without reading manifests. */
    dvCount: Long = 0L,
    /** Shard-level column ranges: per column, the typed fold of the ADD
      * entries' file stats (min of mins / max of maxes / summed null
      * count) — lets a stats-filtered plan SKIP whole shards exactly like
      * `ptMin`/`ptMax` does for partition filters (a 10⁷-file fixture
      * measured plan_stats at 60+ s reading every shard without this; the
      * reference's manifest-list entries carry the analogous stats).
      * A column appears only when every contributing schema agrees on its
      * type and every entry carries its stats — absent columns keep the
      * shard (safe). Empty on pre-colStats snapshots (no skip, correct).
      */
    colStats: Map[String, ColStats] = Map.empty,
    /** Total (raw) row count of ADD entries — the [[colStats]] null-count
      * companion for IsNotNull shard tests. */
    rowCount: Long = 0L,
    /** Fold-run id (> 0 on fold-produced ADD-only shards; 0 on deltas and
      * residual manifests). Consecutive shards with the same id form one
      * partition-sorted RUN; the commit fold merges runs TIERED (adjacent
      * runs within 4× in size fuse, last-wins), so a partition's files
      * overlap O(log live) runs instead of one shard per fold generation —
      * the 10⁷-file fixture measured ~312 of 2446 shards overlapping a
      * single partition without this. 0 on pre-run snapshots: those
      * shards re-fold once (documented migration fold). */
    run: Long = 0L)

/** A committed table version (reference: paimon-core
  * org/apache/paimon/Snapshot.java:68). `manifests` is the full ordered list
  * reconstructing table state; `deltaManifests` the subset added by this
  * commit (the incremental-read axis).
  */
case class Snapshot(
    id: Long,
    schemaId: Long,
    manifests: Seq[String],
    deltaManifests: Seq[String],
    commitKind: String,
    commitIdentifier: Long,
    /** Writer identity of THIS commit (streaming query id / sink
      * checkpoint; "" for ad-hoc batch writes). Reference:
      * Snapshot.commitUser.
      */
    commitUser: String = "",
    totalRecordCount: Long,
    watermark: Option[Long],
    timestampMs: Long,
    manifestMeta: Seq[ManifestMeta] = Nil,
    /** Highest streaming commit identifier in the chain so far — the O(1)
      * exactly-once replay check (identifiers are monotone batch ids;
      * reference: FileStoreCommitImpl.filterCommitted:202-207).
      */
    maxCommitIdentifier: Long = -1L,
    /** Per-commit-user high-water identifiers — the exactly-once replay
      * check is scoped to the WRITER (reference: filterCommitted walks the
      * chain per commitUser, Snapshot.commitUser): two independent
      * streaming queries have independent epoch sequences, so a global
      * max would wrongly skip one writer's batches. The legacy scalar
      * above is the "" (anonymous) user's entry, kept for old snapshots.
      */
    maxCommitIdentifiers: Map[String, Long] = Map.empty,
    /** Manifests of changelog files this commit produced (reference:
      * Snapshot.changelogManifestList — the full-compaction producer's
      * -U/+U/-D stream, Snapshot.java:103-176).
      */
    changelogManifests: Seq[String] = Nil,
    /** Dynamic-bucket hash-index deltas (parquet dirs relative to the table
      * root), carried forward monotonically — together they form the
      * authoritative pk-hash → bucket map (reference: Snapshot.indexManifest
      * + index/HashIndexFile).
      */
    indexFiles: Seq[String] = Nil,
    /** Upper bound on DEAD (shadowed) ADD entries sitting in kept manifest
      * shards — accumulated at incremental manifest folds (same-path
      * DELETE+re-ADD churn, e.g. deletion-vector mask updates, leaves the
      * stale copy in the untouched prefix), reset by a full fold. Drives
      * the proportional full-fold trigger so chain metadata stays within
      * a constant factor of the live file count.
      */
    staleFileEntries: Long = 0L) {

  def toJson: String = {
    val n = Json.obj()
    n.put("id", id); n.put("schemaId", schemaId)
    val ms = n.putArray("manifests"); manifests.foreach(ms.add)
    val dm = n.putArray("deltaManifests"); deltaManifests.foreach(dm.add)
    n.put("commitKind", commitKind)
    n.put("commitIdentifier", commitIdentifier)
    if (commitUser.nonEmpty) n.put("commitUser", commitUser)
    n.put("totalRecordCount", totalRecordCount)
    watermark.foreach(w => n.put("watermark", w))
    n.put("timestampMs", timestampMs)
    n.put("maxCommitIdentifier", maxCommitIdentifier)
    if (maxCommitIdentifiers.nonEmpty) {
      val mu = n.putObject("maxCommitIdentifiers")
      maxCommitIdentifiers.toSeq.sortBy(_._1).foreach { case (u, v) => mu.put(u, v) }
    }
    if (changelogManifests.nonEmpty) {
      val cm = n.putArray("changelogManifests"); changelogManifests.foreach(cm.add)
    }
    if (indexFiles.nonEmpty) {
      val ix = n.putArray("indexFiles"); indexFiles.foreach(ix.add)
    }
    if (staleFileEntries > 0L) n.put("staleFileEntries", staleFileEntries)
    if (manifestMeta.nonEmpty) {
      val mm = n.putArray("manifestMeta")
      manifestMeta.foreach { m =>
        val e = mm.addObject()
        e.put("name", m.name); e.put("entries", m.entries)
        e.put("dataSize", m.dataSize); e.put("addOnly", m.addOnly)
        e.put("dvCount", m.dvCount)
        if (m.run > 0L) e.put("run", m.run)
        val sids = e.putArray("schemaIds"); m.schemaIds.foreach(sids.add)
        m.ptMin.foreach { vs => val a = e.putArray("ptMin"); vs.foreach(a.add) }
        m.ptMax.foreach { vs => val a = e.putArray("ptMax"); vs.foreach(a.add) }
        if (m.colStats.nonEmpty) {
          e.put("rowCount", m.rowCount)
          val cs = e.putObject("colStats")
          m.colStats.toSeq.sortBy(_._1).foreach { case (col, c) =>
            val cn = cs.putObject(col)
            c.min.foreach(v => cn.put("min", v))
            c.max.foreach(v => cn.put("max", v))
            cn.put("nullCount", c.nullCount)
          }
        }
      }
    }
    Json.write(n)
  }
}

object Snapshot {
  def fromJson(s: String): Snapshot = {
    val n = Json.parse(s)
    val meta = Option(n.get("manifestMeta")).map { mm =>
      Json.elems(mm).map { e =>
        ManifestMeta(
          e.get("name").asText(),
          e.get("entries").asLong(),
          e.get("dataSize").asLong(),
          e.get("addOnly").asBoolean(),
          Json.elems(e.get("schemaIds")).map(_.asLong()),
          Option(e.get("ptMin")).map(a => Json.elems(a).map(_.asText())),
          Option(e.get("ptMax")).map(a => Json.elems(a).map(_.asText())),
          Json.optLong(e, "dvCount").getOrElse(0L),
          Option(e.get("colStats")).map { cs =>
            Json.fields(cs).map { case (col, c) =>
              col -> ColStats(Json.optStr(c, "min"), Json.optStr(c, "max"),
                Json.optLong(c, "nullCount").getOrElse(0L))
            }.toMap
          }.getOrElse(Map.empty),
          Json.optLong(e, "rowCount").getOrElse(0L),
          Json.optLong(e, "run").getOrElse(0L))
      }
    }.getOrElse(Nil)
    Snapshot(
      n.get("id").asLong(),
      n.get("schemaId").asLong(),
      Json.elems(n.get("manifests")).map(_.asText()),
      Json.elems(n.get("deltaManifests")).map(_.asText()),
      n.get("commitKind").asText(),
      n.get("commitIdentifier").asLong(),
      Option(n.get("commitUser")).map(_.asText()).getOrElse(""),
      n.get("totalRecordCount").asLong(),
      Json.optLong(n, "watermark"),
      n.get("timestampMs").asLong(),
      meta,
      Json.optLong(n, "maxCommitIdentifier").getOrElse(-1L),
      Option(n.get("maxCommitIdentifiers")).map(mu =>
        Json.fields(mu).map { case (k, v) => k -> v.asLong() }.toMap)
        .getOrElse(Map.empty),
      Option(n.get("changelogManifests"))
        .map(a => Json.elems(a).map(_.asText())).getOrElse(Nil),
      Option(n.get("indexFiles"))
        .map(a => Json.elems(a).map(_.asText())).getOrElse(Nil),
      Json.optLong(n, "staleFileEntries").getOrElse(0L))
  }
}

object ManifestCodec {
  private def statsToJson(parent: com.fasterxml.jackson.databind.node.ObjectNode,
      stats: Map[String, ColStats]): Unit = {
    val sn = parent.putObject("stats")
    stats.toSeq.sortBy(_._1).foreach { case (col, cs) =>
      val c = sn.putObject(col)
      cs.min.foreach(v => c.put("min", v))
      cs.max.foreach(v => c.put("max", v))
      c.put("nullCount", cs.nullCount)
    }
  }

  def entriesToJson(entries: Seq[ManifestEntry]): String = {
    val root = Json.obj()
    val arr = root.putArray("entries")
    entries.foreach { e =>
      val en = arr.addObject()
      en.put("kind", e.kind)
      val f = e.file
      en.put("path", f.path); en.put("size", f.size); en.put("rowCount", f.rowCount)
      val pt = en.putArray("partition"); f.partition.foreach(pt.add)
      en.put("bucket", f.bucket); en.put("level", f.level)
      en.put("minSeq", f.minSeq); en.put("maxSeq", f.maxSeq)
      en.put("schemaId", f.schemaId)
      f.dvPath.foreach { p => en.put("dvPath", p); en.put("dvCount", f.dvCount) }
      if (f.blooms.nonEmpty) {
        val bn = en.putObject("blooms")
        f.blooms.toSeq.sortBy(_._1).foreach { case (c, p) => bn.put(c, p) }
      }
      statsToJson(en, f.stats)
    }
    Json.write(root)
  }

  private def statsFromJson(n: JsonNode): Map[String, ColStats] =
    Option(n.get("stats")).map { sn =>
      Json.fields(sn).map { case (col, c) =>
        col -> ColStats(Json.optStr(c, "min"), Json.optStr(c, "max"),
          Json.optLong(c, "nullCount").getOrElse(0L))
      }.toMap
    }.getOrElse(Map.empty)

  def entriesFromJson(s: String): Seq[ManifestEntry] = {
    Json.elems(Json.parse(s).get("entries")).map { en =>
      ManifestEntry(
        en.get("kind").asInt(),
        DataFileMeta(
          en.get("path").asText(), en.get("size").asLong(),
          en.get("rowCount").asLong(),
          Json.elems(en.get("partition")).map(_.asText()),
          en.get("bucket").asInt(), en.get("level").asInt(),
          en.get("minSeq").asLong(), en.get("maxSeq").asLong(),
          en.get("schemaId").asLong(),
          statsFromJson(en),
          Json.optStr(en, "dvPath"),
          Json.optLong(en, "dvCount").getOrElse(0L),
          Option(en.get("blooms")).map(b =>
            Json.fields(b).map { case (c, p) => c -> p.asText() }.toMap)
            .getOrElse(Map.empty)))
    }
  }

  // ---- v2 BINARY manifest format (reference: paimon's Avro manifests —
  // compact rows, no per-field name lookups). The JSON codec above is
  // parse-bound at scale: a cold 10⁷-entry fold measured 126 s (≈5 GB of
  // Jackson DOM), and a fold whose span exceeds the entry cache re-pays
  // it on EVERY unpruned plan. The binary layout cuts bytes ~3× and
  // parses ~10× faster. Writers emit v2; readers dispatch on the magic,
  // so pre-v2 JSON manifests in existing chains keep reading. ----

  /** "GM2\n" — first byte can never be '{' (JSON) so dispatch is safe.
    * v2 strings are `writeUTF` (2-byte length ⇒ hard 65535-byte cap):
    * read-only legacy — a table in `metadata.stats-mode=full` carries
    * UNTRUNCATED min/max, and one >64 KB text bound made every v2 commit
    * throw `UTFDataFormatException`. v3 ("GM3\n") writes every string
    * length-prefixed (varint-free `writeInt` + raw UTF-8), no cap.
    */
  private val BinaryMagic: Array[Byte] = Array('G', 'M', '2', '\n').map(_.toByte)
  private val BinaryMagicV3: Array[Byte] = Array('G', 'M', '3', '\n').map(_.toByte)

  private def writeStr(o: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    o.writeInt(b.length); o.write(b)
  }
  private def writeOptStr(o: java.io.DataOutputStream, v: Option[String]): Unit = {
    o.writeBoolean(v.isDefined); v.foreach(writeStr(o, _))
  }

  def entriesToBytes(entries: Seq[ManifestEntry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(entries.size * 160 + 16)
    val o = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(bos, 1 << 16))
    o.write(BinaryMagicV3)
    o.writeInt(entries.size)
    entries.foreach { e =>
      o.writeByte(e.kind)
      val f = e.file
      writeStr(o, f.path); o.writeLong(f.size); o.writeLong(f.rowCount)
      o.writeShort(f.partition.size); f.partition.foreach(writeStr(o, _))
      o.writeInt(f.bucket); o.writeInt(f.level)
      o.writeLong(f.minSeq); o.writeLong(f.maxSeq); o.writeLong(f.schemaId)
      writeOptStr(o, f.dvPath); o.writeLong(f.dvCount)
      o.writeShort(f.blooms.size)
      f.blooms.toSeq.sortBy(_._1).foreach { case (c, p) =>
        writeStr(o, c); writeStr(o, p)
      }
      o.writeShort(f.stats.size)
      f.stats.toSeq.sortBy(_._1).foreach { case (c, cs) =>
        writeStr(o, c); writeOptStr(o, cs.min); writeOptStr(o, cs.max)
        o.writeLong(cs.nullCount)
      }
    }
    o.flush()
    bos.toByteArray
  }

  /** Decode a binary manifest body; v2 and v3 share the field layout and
    * differ only in string encoding, so one reader parameterized on the
    * string decoder covers both.
    */
  private def entriesFromBinary(bytes: Array[Byte], v3: Boolean): Seq[ManifestEntry] = {
    val i = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes, BinaryMagic.length,
        bytes.length - BinaryMagic.length))
    def str(): String =
      if (!v3) i.readUTF()
      else {
        val n = i.readInt()
        val b = new Array[Byte](n); i.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      }
    def optStr(): Option[String] = if (i.readBoolean()) Some(str()) else None
    val n = i.readInt()
    val out = new scala.collection.immutable.VectorBuilder[ManifestEntry]
    var k = 0
    while (k < n) {
      val kind = i.readByte().toInt
      val path = str(); val size = i.readLong(); val rows = i.readLong()
      val np = i.readShort().toInt
      val part = if (np == 0) Nil else Seq.fill(np)(str())
      val bucket = i.readInt(); val level = i.readInt()
      val minSeq = i.readLong(); val maxSeq = i.readLong()
      val schemaId = i.readLong()
      val dvPath = optStr(); val dvCount = i.readLong()
      val nb = i.readShort().toInt
      val blooms = if (nb == 0) Map.empty[String, String]
        else (0 until nb).map(_ => str() -> str()).toMap
      val ns = i.readShort().toInt
      val stats = if (ns == 0) Map.empty[String, ColStats]
        else (0 until ns).map(_ => str() ->
          ColStats(optStr(), optStr(), i.readLong())).toMap
      out += ManifestEntry(kind, DataFileMeta(path, size, rows, part,
        bucket, level, minSeq, maxSeq, schemaId, stats, dvPath, dvCount,
        blooms))
      k += 1
    }
    out.result()
  }

  private def hasMagic(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length &&
      java.util.Arrays.equals(bytes, 0, magic.length, magic, 0, magic.length)

  /** Read any format: v3/v2 binary by magic, else legacy JSON. */
  def entriesFromAny(bytes: Array[Byte]): Seq[ManifestEntry] =
    if (hasMagic(bytes, BinaryMagicV3)) entriesFromBinary(bytes, v3 = true)
    else if (hasMagic(bytes, BinaryMagic)) entriesFromBinary(bytes, v3 = false)
    else entriesFromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
}

/** One column's ANALYZE statistics (reference: paimon-core
  * stats/ColStats.java — NDV via HLL sketch, null count, bounds, lengths).
  * min/max use the StatsCodec string encoding (timestamps as micros, dates
  * as epoch days).
  */
case class AnalyzedColStats(
    ndv: Long,
    nullCount: Long,
    min: Option[String],
    max: Option[String],
    avgLen: Option[Long],
    maxLen: Option[Long])

/** Table-level ANALYZE output served to Catalyst CBO through the DSv2 scan
  * (reference: stats/Statistics.java + PaimonStatistics.scala:35-50).
  */
case class TableColStats(
    snapshotId: Long,
    rowCount: Long,
    cols: Map[String, AnalyzedColStats]) {

  def toJson: String = {
    val n = Json.obj()
    n.put("snapshotId", snapshotId)
    n.put("rowCount", rowCount)
    val cs = n.putObject("cols")
    cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val e = cs.putObject(name)
      e.put("ndv", c.ndv); e.put("nullCount", c.nullCount)
      c.min.foreach(e.put("min", _)); c.max.foreach(e.put("max", _))
      c.avgLen.foreach(e.put("avgLen", _)); c.maxLen.foreach(e.put("maxLen", _))
    }
    Json.write(n)
  }
}

object TableColStats {
  def fromJson(s: String): TableColStats = {
    val n = Json.parse(s)
    val cs = n.get("cols")
    val cols = cs.fields()
    val m = scala.collection.mutable.LinkedHashMap.empty[String, AnalyzedColStats]
    cols.forEachRemaining { e =>
      val c = e.getValue
      m.put(e.getKey, AnalyzedColStats(
        c.get("ndv").asLong(),
        c.get("nullCount").asLong(),
        Option(c.get("min")).map(_.asText()),
        Option(c.get("max")).map(_.asText()),
        Json.optLong(c, "avgLen"),
        Json.optLong(c, "maxLen")))
    }
    TableColStats(n.get("snapshotId").asLong(), n.get("rowCount").asLong(), m.toMap)
  }
}
