package graft.spark.v2

import graft.core.Snapshot
import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Set => JSet}
import scala.collection.JavaConverters._

/** DSv2 table over a [[GraftTable]] (reference: SparkTable.scala:38): SQL
  * reads with pushdown + bucket-local MOR, SQL writes via the V1
  * InsertableRelation fallback (the reference does the same —
  * SparkWrite.scala:30 — so INSERT reuses the whole distributed write
  * path), truncate/overwrite, filter DELETE, and time travel via
  * `VERSION AS OF` (snapshot id) / tag name.
  */
class GraftSparkTable(
    spark: SparkSession,
    val table: GraftTable,
    ident: Identifier,
    snapshot: Option[Snapshot] = None,
    /** Operation-level ACL hook (reference: PrivilegedFileStoreTable checks
      * SELECT on newScan, INSERT on newWrite); throws AccessDenied.
      */
    acl: String => Unit = _ => ()) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete with TruncatableTable
    with SupportsMetadataColumns {

  override def name(): String = ident.toString

  override def schema(): StructType = table.schema.structType

  /** Exposed metadata columns (reference: PaimonMetadataColumn.scala:42-49):
    * `__file_path` (raw scans) and `__bucket` (all scans of PK tables).
    */
  override def metadataColumns(): Array[MetadataColumn] = {
    val filePath = new MetadataColumn {
      override def name(): String = GraftSparkTable.FilePathCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
    }
    val bucket = new MetadataColumn {
      override def name(): String = graft.GraftMeta.BucketCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
    }
    val rowIndex = new MetadataColumn {
      override def name(): String = GraftSparkTable.RowIndexCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
    }
    if (table.schema.hasBucketDirs) Array(filePath, rowIndex, bucket)
    else Array(filePath, rowIndex)
  }

  // no OVERWRITE_DYNAMIC: Spark's dynamic-partition-overwrite exec has no
  // V1 fallback; dynamic overwrite is served by the library API
  // (GraftTable.overwrite(dynamic = true)); SQL gets static INSERT
  // OVERWRITE [PARTITION (...)] via OVERWRITE_BY_FILTER
  override def capabilities(): JSet[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE,
    TableCapability.V1_BATCH_WRITE,
    TableCapability.STREAMING_WRITE,
    TableCapability.OVERWRITE_BY_FILTER,
    TableCapability.TRUNCATE).asJava

  override def partitioning(): Array[Transform] =
    table.schema.partitionKeys.map(Expressions.identity).toArray

  override def properties(): java.util.Map[String, String] = {
    val base = table.schema.options ++
      Map("path" -> table.location) ++
      (if (table.isPrimaryKeyed)
        Map("primary-key" -> table.schema.primaryKeys.mkString(",")) else Map.empty)
    base.asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    acl(graft.core.Privilege.Select)
    val snap = snapshot.orElse {
      Option(options.get("scan.snapshot-id")).map(id => table.store.readSnapshot(id.toLong))
        .orElse(Option(options.get("scan.tag-name")).map(table.store.readTag))
        .orElse(Option(options.get("scan.mode")).collect {
          // content as of the latest full compaction (reference:
          // CoreOptions.StartupMode COMPACTED_FULL); falls back to latest
          // when the table was never compacted
          case "compacted-full" => table.latestCompactSnapshot
        }.flatten)
    }
    new GraftScanBuilder(spark, table, snap)
  }

  // ---------------- writes (V1 fallback, reference SparkWrite.scala:30) ----

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    acl(graft.core.Privilege.Insert)
    new WriteBuilder with SupportsTruncate with SupportsOverwrite
        with SupportsDynamicOverwrite {
      private var mode: String = "append"
      private var overwriteFilters: Array[Filter] = Array.empty

      override def truncate(): WriteBuilder = { mode = "truncate"; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        mode = "overwrite"; overwriteFilters = filters; this
      }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        mode = "dynamic"; this
      }

      override def build(): Write = new V1Write {
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          val spark = org.apache.spark.sql.SparkSession.active
          new GraftStreamingWrite(table.location, info.schema(), info.queryId(),
            new org.apache.spark.util.SerializableConfiguration(
              spark.sparkContext.hadoopConfiguration))
        }
        override def toInsertableRelation: InsertableRelation = (data, _) => {
          if (sys.env.contains("GRAFT_DEBUG_SCAN"))
            println(s"[write-debug] mode=$mode filters=${overwriteFilters.mkString(";")}")
          mode match {
            case "append" => table.write(data)
            case "truncate" => table.overwrite(data)
            case "dynamic" => table.overwrite(data, dynamic = true)
            case "overwrite" =>
              import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe, EqualTo}
              def staticEq(f: Filter): Option[(String, String)] = f match {
                case EqualTo(c, v) if v != null &&
                  table.schema.partitionKeys.contains(c) => Some(c -> v.toString)
                case EqualNullSafe(c, v) if v != null &&
                  table.schema.partitionKeys.contains(c) => Some(c -> v.toString)
                case _ => None
              }
              val static = overwriteFilters.flatMap(staticEq).toMap
              val allStatic = overwriteFilters.forall(f =>
                staticEq(f).isDefined || f.isInstanceOf[AlwaysTrue])
              if (allStatic && static.nonEmpty)
                table.overwrite(data, staticPartition = static)
              else table.overwrite(data)
          }
        }
      }
    }
  }

  // ---------------- DELETE WHERE (reference: SupportsDelete path of
  // DeleteFromPaimonTableCommand) ----------------

  override def canDeleteWhere(filters: Array[Filter]): Boolean = true

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.{expr, lit}
    val cond = filters.map(filterToColumn).reduceOption(_ && _).getOrElse(lit(true))
    table.delete(cond)
  }

  override def truncateTable(): Boolean = { table.truncate(); true }

  private def filterToColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(c, v) => col(c) === lit(v)
      case EqualNullSafe(c, v) => col(c) <=> lit(v)
      case GreaterThan(c, v) => col(c) > lit(v)
      case GreaterThanOrEqual(c, v) => col(c) >= lit(v)
      case LessThan(c, v) => col(c) < lit(v)
      case LessThanOrEqual(c, v) => col(c) <= lit(v)
      case In(c, vs) => col(c).isin(vs.toIndexedSeq: _*)
      case IsNull(c) => col(c).isNull
      case IsNotNull(c) => col(c).isNotNull
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => !filterToColumn(c)
      case StringStartsWith(c, p) => col(c).startsWith(p)
      case StringEndsWith(c, p) => col(c).endsWith(p)
      case StringContains(c, p) => col(c).contains(p)
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case other => throw new UnsupportedOperationException(s"DELETE filter: $other")
    }
  }
}

object GraftSparkTable {
  val FilePathCol = "__file_path"
  val RowIndexCol = "__row_index"
}
