package graft

import org.apache.spark.sql.types._

/** Metadata column names and row-kind codes shared across the engine.
  *
  * RowKind algebra mirrors the reference CDC model (paimon-common
  * org/apache/paimon/types/RowKind.java:29-56): +I insert, -U update-before,
  * +U update-after, -D delete — stored as a byte in data files of
  * primary-key tables alongside the commit sequence number (reference
  * KeyValue model: paimon-core org/apache/paimon/KeyValue.java:44-55).
  */
object GraftMeta {
  val SeqCol = "__graft_seq"
  /** Within-commit input position — breaks ties between two versions of the
    * same key in one batch (reference: MergeTreeWriter.java:139 assigns
    * per-row monotonically increasing sequence numbers; we keep the commit
    * sequence in [[SeqCol]] and the per-row offset here).
    */
  val PosCol = "__graft_pos"
  val KindCol = "__graft_kind"
  val BucketCol = "__bucket"

  val KindInsert: Byte = 0 // +I
  val KindUpdateBefore: Byte = 1 // -U
  val KindUpdateAfter: Byte = 2 // +U
  val KindDelete: Byte = 3 // -D

  val kindNames: Map[Byte, String] =
    Map(KindInsert -> "+I", KindUpdateBefore -> "-U",
      KindUpdateAfter -> "+U", KindDelete -> "-D")
  val kindCodes: Map[String, Byte] = kindNames.map(_.swap)

  val seqField = StructField(SeqCol, LongType, nullable = false)
  val posField = StructField(PosCol, LongType, nullable = false)
  val kindField = StructField(KindCol, ByteType, nullable = false)
  val bucketField = StructField(BucketCol, IntegerType, nullable = false)
}
